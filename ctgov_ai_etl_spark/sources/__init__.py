"""Sources & sinks: paginated REST data source, reference-parity CSV sink."""
