"""Pipeline plans: the config-driven ETL driver."""
