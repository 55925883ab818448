"""Paginated REST study source as a Spark 4 Python DataSource
(reference R2/R3/R4; /root/reference/etl.py:86-171).

The reference fetches pages sequentially on the driver — GET with a
60 s timeout, ``nextPageToken`` loop, hard cap of 100 pages
(etl.py:115-157) — and pushes its conjunctive Essie filter to the
server as ``filter.advanced`` (etl.py:97-105).  Here the same source
is a ``DataSource`` so it participates in a Spark plan:

- **partition planning = pagination.**  When the backend supports
  numbered pages (``paging=indexed``), each page becomes an
  ``InputPartition`` and executors fetch in parallel.  The public
  CTGov v2 API only hands out opaque ``nextPageToken``s
  (etl.py:146-152), which serializes page *discovery*; in that mode
  the source walks tokens in one partition (documented limitation,
  identical to the reference's behavior) — at scale you mirror the
  API to storage once and scan parquet.
- **filter pushdown.**  ``pushFilters`` translates supported Catalyst
  filters on the flat columns into Essie conjuncts (AND-joined like
  the reference's config list) and keeps the rest for Spark to
  evaluate — the DSv2 contract, with the Essie grammar as the remote
  dialect (SURVEY.md §2.2).
- **fault semantics.**  Any page error aborts the read (the reference
  aborts the whole extract on any non-200, etl.py:124-127,163-171);
  timeout/page-cap are options with the reference's defaults.

Rows come back as JSON strings (one per study) so the downstream plan
is ``from_json(RAW_STUDY) → flatten_studies`` — schema application is
Spark's, not the transport's.

Transports are pluggable via a ``transport_factory`` option holding a
``module:function`` path (importable in the Python workers); tests use
the deterministic fixture transport in ``fixtures.mock_ctgov_transport``
so no network is touched in CI.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNull,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    StringContains,
)
from pyspark.sql.types import StringType, StructField, StructType

DEFAULT_PAGE_SIZE = 1000  # reference default, etl.py:103
DEFAULT_MAX_PAGES = 100  # reference hard cap, etl.py:156-157
DEFAULT_TIMEOUT_S = 60.0  # reference timeout, etl.py:121
# Largest In-filter that still pushes down as an Essie OR-group; a
# bigger set would expand into a query-string URL past typical server
# request-line limits (~8 KB), so it stays a client-side residual.
MAX_IN_PUSHDOWN = 50

# A transport takes (params, page_index_or_token) and returns the page
# dict {"studies": [...], "nextPageToken": str|None}.
Transport = Callable[[dict[str, Any], Any], dict[str, Any]]


def resolve_transport_factory(dotted: str) -> Callable[..., Transport]:
    """Resolve a ``module:function`` transport factory by import.

    Python data source readers are constructed inside Spark's Python
    worker processes, so the factory must be importable there (the
    engine ships itself via addPyFile — session.ship_package); an
    in-process registry would be invisible to the workers.
    """
    import importlib

    mod_name, _, fn_name = dotted.partition(":")
    return getattr(importlib.import_module(mod_name), fn_name)


def _http_transport(url: str, timeout_s: float) -> Transport:
    def fetch(params: dict[str, Any], token: Any) -> dict[str, Any]:
        import requests  # gated: only the live path needs it

        q = dict(params)
        if token:
            q["pageToken"] = token
        resp = requests.get(url, params=q, timeout=timeout_s)
        resp.raise_for_status()
        return resp.json()

    return fetch


class TransientPageError(Exception):
    """A page fetch failure worth retrying (transport-defined: custom
    transports raise this to opt a failure into the retry policy)."""


def _is_transient(exc: Exception) -> bool:
    """Retryable = timeouts, connection drops, HTTP 5xx, or an explicit
    :class:`TransientPageError`.  4xx/parse errors are NOT retried —
    they abort the read exactly like the reference (etl.py:124-127,
    163-171): retrying a request the server rejected is wasted quota."""
    if isinstance(exc, TransientPageError):
        return True
    try:
        import requests
    except ImportError:  # fixture transports without the live dep
        return False
    if isinstance(exc, (requests.exceptions.Timeout, requests.exceptions.ConnectionError)):
        return True
    if isinstance(exc, requests.exceptions.HTTPError):
        resp = exc.response
        return resp is not None and resp.status_code >= 500
    return False


def with_retries(
    transport: Transport, max_retries: int, backoff_s: float = 0.5
) -> Transport:
    """Wrap a transport with jittered exponential backoff on TRANSIENT
    failures (see :func:`_is_transient`).  ``max_retries=0`` (the
    default everywhere) returns the transport untouched — the
    reference's abort-on-any-error semantics are preserved unless the
    caller opts in.  At 100 pages a single transient 503 otherwise
    kills the whole read; sleeps are ``backoff_s · 2^attempt`` with
    ±50% jitter so a fleet of executors retrying the same flapping
    endpoint doesn't stampede it in lockstep."""
    if max_retries <= 0:
        return transport

    def fetch(params: dict[str, Any], token: Any) -> dict[str, Any]:
        import random as _random
        import time as _time

        attempt = 0
        while True:
            try:
                return transport(params, token)
            except Exception as exc:
                if attempt >= max_retries or not _is_transient(exc):
                    raise
                _time.sleep(backoff_s * (2**attempt) * (0.5 + _random.random()))
                attempt += 1

    return fetch


# --------------------------------------------------- filter translation

def filters_to_essie(filters: list[Filter]) -> tuple[list[str], list[Filter]]:
    """Translate Catalyst filters to Essie conjuncts; return
    (conjuncts, unsupported) — unsupported stay with Spark (the DSv2
    pushdown contract). Mirrors the grammar the reference ships
    (config.example.yaml:4-12)."""
    conjuncts: list[str] = []
    unsupported: list[Filter] = []
    for f in filters:
        col = ".".join(f.attribute) if hasattr(f, "attribute") else None
        area = col.split(".")[-1] if col else None
        if isinstance(f, EqualTo):
            conjuncts.append(f"AREA[{area}]{f.value}")
        elif isinstance(f, GreaterThanOrEqual):
            conjuncts.append(f"AREA[{area}]RANGE[{f.value},MAX]")
        elif isinstance(f, LessThanOrEqual):
            conjuncts.append(f"AREA[{area}]RANGE[MIN,{f.value}]")
        elif isinstance(f, IsNull):
            conjuncts.append(f"AREA[{area}]MISSING")
        elif isinstance(f, StringContains):
            conjuncts.append(f"SEARCH[{area}]{f.value}")
        elif isinstance(f, In) and len(f.value) <= MAX_IN_PUSHDOWN:
            # isin → Essie OR-group: the grammar the reference's own
            # config exercises ((AREA[Sex]FEMALE OR AREA[Sex]ALL),
            # config.example.yaml:8,12).  This is the R9 tuning-set
            # narrowing done SERVER-side — without it an isin over
            # nct_ids fetches the whole corpus over HTTP and filters
            # client-side.  Capped at MAX_IN_PUSHDOWN values: a 10k-id
            # isin would expand into an unbounded query-string URL
            # (servers reject multi-KB GET lines); beyond the cap the
            # filter stays client-side via ``unsupported`` and Spark
            # re-applies it — correct either way, per the DSv2
            # residual contract.
            disj = " OR ".join(f"AREA[{area}]{v}" for v in f.value)
            conjuncts.append(f"({disj})")
        else:
            unsupported.append(f)
    return conjuncts, unsupported


@dataclass
class PagePartition(InputPartition):
    page: int = 0


class RestStudiesReader(DataSourceReader):
    def __init__(self, options: dict[str, str]):
        self.options = options
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.max_pages = int(options.get("max_pages", DEFAULT_MAX_PAGES))
        self.timeout_s = float(options.get("timeout_s", DEFAULT_TIMEOUT_S))
        self.indexed = options.get("paging", "token") == "indexed"
        self.url = options.get("url", "")
        factory = options.get("transport_factory")
        if factory:
            import json as _json

            args = _json.loads(options.get("transport_args", "[]"))
            self.transport = resolve_transport_factory(factory)(*args)
        else:
            self.transport = _http_transport(self.url, self.timeout_s)
        self.transport = with_retries(
            self.transport,
            int(options.get("max_retries", 0)),
            float(options.get("backoff_s", 0.5)),
        )
        # filter.advanced starts from any config-provided conjuncts,
        # exactly like the reference AND-joins its YAML list (etl.py:100)
        adv = options.get("filter_advanced")
        self.conjuncts: list[str] = [adv] if adv else []
        # Projection pushdown (SURVEY.md §4): the CTGov v2 API's
        # ``fields`` query param returns only the requested dotted
        # study paths — the server-side analogue of parquet column
        # pruning.  Catalyst can't derive it (the source's schema is
        # one RAW_STUDY json column), so it's an explicit option;
        # operators/flatten.py:flatten_fields() yields the projection
        # the reference pipeline needs, ~10 leaves instead of the
        # full study document (the reference always fetches whole
        # studies, etl.py:115-157).
        self.fields = options.get("fields")

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        pushed, unsupported = filters_to_essie(list(filters))
        self.conjuncts.extend(pushed)
        return iter(unsupported)

    def _params(self) -> dict[str, Any]:
        params: dict[str, Any] = {"pageSize": self.page_size}
        if self.conjuncts:
            params["filter.advanced"] = " AND ".join(self.conjuncts)
        if self.fields:
            params["fields"] = self.fields
        return params

    def partitions(self) -> list[InputPartition]:
        if self.indexed:
            # page count is discoverable → one partition per page,
            # fetched in parallel by executors
            return [PagePartition(i) for i in range(self.max_pages)]
        return [PagePartition(0)]  # opaque-token mode: sequential walk

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        transport = self.transport
        params = self._params()
        if self.indexed:
            page = transport(params, partition.page)
            for study in page.get("studies", []):
                yield (json.dumps(study, sort_keys=True),)
            return
        token: Any = None
        for _ in range(self.max_pages):  # reference page cap, etl.py:156
            page = transport(params, token)
            for study in page.get("studies", []):
                yield (json.dumps(study, sort_keys=True),)
            token = page.get("nextPageToken")
            if not token:  # etl.py:147-150
                return


class RestStudiesStreamReader(SimpleDataSourceStreamReader):
    """The reference's token-pagination loop (etl.py:115-157)
    INCREMENTALIZED: each micro-batch pulls up to ``pages_per_batch``
    pages from the last committed offset, so ingestion is resumable
    (offsets persist in the checkpoint), rate-bounded per trigger, and
    composable with every downstream streaming operator — versus the
    reference's one-shot eager walk.

    Offsets are the page cursor itself: ``{"token": str|None, "page":
    int, "done": bool}``.  ``readBetweenOffsets`` replays a committed
    range by re-walking tokens from the range's start — exactly-once
    delivery for backends whose token walk is stable (the fixture
    transport is; a live API that recycles tokens gets at-least-once,
    the same guarantee the reference's restart-from-scratch loop has).
    When the walk exhausts (no next token / page cap), ``read``
    returns the same offset forever — an ``availableNow`` trigger
    terminates, a continuous trigger idles.
    """

    def __init__(self, options: dict[str, str]):
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.max_pages = int(options.get("max_pages", DEFAULT_MAX_PAGES))
        self.timeout_s = float(options.get("timeout_s", DEFAULT_TIMEOUT_S))
        self.pages_per_batch = int(options.get("pages_per_batch", 1))
        self.url = options.get("url", "")
        factory = options.get("transport_factory")
        if factory:
            args = json.loads(options.get("transport_args", "[]"))
            self.transport = resolve_transport_factory(factory)(*args)
        else:
            self.transport = _http_transport(self.url, self.timeout_s)
        self.transport = with_retries(
            self.transport,
            int(options.get("max_retries", 0)),
            float(options.get("backoff_s", 0.5)),
        )
        adv = options.get("filter_advanced")
        self._params: dict[str, Any] = {"pageSize": self.page_size}
        if adv:
            self._params["filter.advanced"] = adv
        if options.get("fields"):  # server-side projection, as in batch
            self._params["fields"] = options["fields"]

    def initialOffset(self) -> dict:
        return {"token": None, "page": 0, "done": False}

    def _walk(self, start: dict, n_pages: int) -> tuple[list[tuple], dict]:
        rows: list[tuple] = []
        token, page, done = start.get("token"), start["page"], start.get("done", False)
        for _ in range(n_pages):
            if done or page >= self.max_pages:
                done = True
                break
            pg = self.transport(self._params, token)
            rows.extend(
                (json.dumps(s, sort_keys=True),) for s in pg.get("studies", [])
            )
            token = pg.get("nextPageToken")
            page += 1
            if not token:
                done = True
                break
        return rows, {"token": token, "page": page, "done": done}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows, end = self._walk(start, self.pages_per_batch)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows, _ = self._walk(start, max(end["page"] - start["page"], 0))
        return iter(rows)


class RestStudiesDataSource(DataSource):
    """``spark.read.format("ctgov_rest")`` — paginated study source;
    ``spark.readStream.format("ctgov_rest")`` — the same pagination as
    a micro-batch stream."""

    @classmethod
    def name(cls) -> str:
        return "ctgov_rest"

    def schema(self) -> StructType:
        return StructType([StructField("raw_json", StringType())])

    def reader(self, schema: StructType) -> DataSourceReader:
        return RestStudiesReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> RestStudiesStreamReader:
        return RestStudiesStreamReader(self.options)


def register(spark) -> None:
    from ctgov_ai_etl_spark.session import ship_package
    from ctgov_ai_etl_spark.tables import ensure_session_confs

    ensure_session_confs(spark)  # enables Python-source filter pushdown
    ship_package(spark)
    spark.dataSource.register(RestStudiesDataSource)
