"""User-facing facade — the reference's two abstractions, explicitly.

The reference's whole declared surface is "apply complex
transformations on single events or collections"
(/root/reference/README.md:2).  This facade names those two nouns:

    eng = Engine.local()
    eng.bind("/root/testdata/sf0.01")

    eng.collection("lineitem")          # batch DataFrame (bounded)
    eng.events("events")                # event-time-ordered batch view
    eng.event_stream(chunk_dir)         # unbounded readStream DataFrame
    eng.sql("SELECT ...")               # ANSI SQL over bound tables
    eng.run("q_pricing_summary")        # any registered operator
    eng.keys()                          # the full operator inventory
    eng.table(path)                     # ACID lakehouse table (MERGE,
                                        #   time travel, OPTIMIZE, VACUUM)
    eng.build_ann_index("ivf"|"pq"|"graph")  # persisted vector indexes

Everything returns a plain pyspark DataFrame on purpose: the engine's
transformation vocabulary IS the DataFrame API plus the registered
operator library — no parallel expression language to learn, and any
existing Spark tooling composes with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from processor_spark import registry
from processor_spark.session import build_session
from processor_spark.sources import fixtures


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir: str | None = None
        if sf_dir:
            self.bind(sf_dir)

    @classmethod
    def local(cls, sf_dir: str | None = None, **session_kwargs) -> "Engine":
        return cls(build_session(**session_kwargs), sf_dir)

    def bind(self, sf_dir: str) -> "Engine":
        """Bind a dataset directory and register every table as a temp view."""
        self.sf_dir = sf_dir
        fixtures.register_views(self.spark, sf_dir)
        return self

    def _require_bound(self) -> str:
        if self.sf_dir is None:
            raise RuntimeError("no dataset bound; call engine.bind(sf_dir) first")
        return self.sf_dir

    # -- collections (bounded) -------------------------------------------------
    def collection(self, table: str) -> DataFrame:
        return fixtures.load(self.spark, self._require_bound(), table)

    def sql(self, query: str) -> DataFrame:
        self._require_bound()
        return self.spark.sql(query)

    # -- events (unbounded / event-time) --------------------------------------
    def events(self, table: str = "events") -> DataFrame:
        """Event table as a batch view ordered by event time (dev/replay)."""
        return self.collection(table).orderBy("ts")

    def event_stream(self, chunk_dir: str) -> DataFrame:
        """Unbounded event stream from a directory of chunk files."""
        from processor_spark.streaming.pipelines import read_events_stream

        return read_events_stream(self.spark, chunk_dir)

    # -- operator library ------------------------------------------------------
    def run(self, key: str) -> DataFrame:
        """Run a registered operator from the SURVEY.md §2 inventory."""
        return registry.get(key).fn(self.spark, self._require_bound())

    @staticmethod
    def keys() -> list[str]:
        return sorted(registry.queries())

    @staticmethod
    def describe(key: str) -> str:
        q = registry.get(key)
        return f"{q.key}: {q.doc.strip().splitlines()[0] if q.doc else '(no doc)'}"

    # -- lakehouse tables (r6) -------------------------------------------------
    def table(self, path: str):
        """ACID lakehouse table handle (sources/lakehouse.py): snapshot
        manifests, bucket-pruned MERGE, time travel, OPTIMIZE,
        expire_snapshots, streaming MERGE — create/read/merge all take
        this engine's SparkSession."""
        from processor_spark.sources.lakehouse import LakeTable

        return LakeTable(path)

    # -- persisted ANN indexes (r6) --------------------------------------------
    def build_ann_index(self, kind: str = "ivf", **kwargs) -> str:
        """Build (or reuse) the persisted ANN index of the given kind
        over the bound dataset's embeddings; returns the index path.
        Kinds: 'ivf' (cell-partitioned assignments), 'pq' (codebook +
        code table), 'graph' (k-NN graph + bucket postings).  The
        matching q_ann_<kind>_serve operators answer queries from it."""
        from processor_spark.operators import similarity as S

        builders = {
            "ivf": S.build_ivf_index,
            "pq": S.build_pq_index,
            "graph": S.build_graph_index,
        }
        if kind not in builders:
            raise ValueError(f"unknown index kind {kind!r}; one of {sorted(builders)}")
        return builders[kind](self.spark, self._require_bound(), **kwargs)


def run_observed(df: DataFrame, name: str = "metrics", **metric_exprs) -> tuple[list, dict]:
    """Execute ``df`` with inline pipeline metrics via ``df.observe()``
    — Spark's zero-cost observability hook: the metric aggregates ride
    the SAME job (evaluated inside the existing plan, no second scan),
    and are read from the Observation after the action completes.

    At 100 TB this is how a pipeline audits itself without paying for
    audit queries: row counts, null counts, value bounds computed as a
    side effect of the write it was already doing.

    ``metric_exprs`` maps metric name -> aggregate Column.  Returns
    (result as a pandas DataFrame — Arrow-batched, the same
    materialization rule bench.py follows, metrics dict).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(n) for n, c in metric_exprs.items()])
    rows = observed.toPandas()
    return rows, obs.get
