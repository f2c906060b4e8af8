"""Crawl-state catalog: parquet snapshot tables with atomic round commits.

The design target is Iceberg (`frontier`/`seen`/`fetched`/`lineage` as
Iceberg tables, one transaction per crawl round, resume = read the latest
snapshot — SURVEY.md §7.0).  The sandbox has no Iceberg runtime jar, so this
module implements the same contract on plain parquet + an atomic commit
marker, preserving every semantic the engine relies on:

- **round atomicity**: each round writes its table deltas under
  ``<root>/<table>/round=<k>/`` (idempotent ``overwrite``), then publishes a
  commit marker via ``os.replace`` (atomic on POSIX).  The marker is written
  *last*, mirroring the reference's write-results-after-every-file
  checkpoint discipline (/root/reference/warcit/converter.py:129-130) and
  solving the cross-table-atomicity hard part (SURVEY.md §7.3 #4): a round
  without a marker is invisible and is simply re-run on resume.
- **partition pruning**: ``round`` is a physical partition column, so
  ``read_table(upto_round=k)`` prunes files without touching newer data.
- **lineage**: per-(round, partition) counters are a table like any other;
  the lineage delta doubles as the round's audit record.

On a real cluster, swap ``_write_delta``/``read_table`` for
``df.writeTo(...).append()`` / ``spark.read.table(...)`` — call sites do not
change.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = ("frontier", "seen", "fetched", "lineage")

SEEN_COLS = ("url", "host", "reason", "round_seen")


@dataclass
class CrawlState:
    root: str
    # >0: the seen table is written url-hash-bucketed (Hive-style bucketed
    # parquet, the no-Iceberg analog of ``bucket(N, url)``), so the
    # per-round anti-join scans seen co-partitioned — ZERO exchange on the
    # seen side; only the O(round-delta) candidate side shuffles.  This is
    # the 10^10-URL layout: without it every round re-shuffles the full
    # seen set.  0 = plain round-delta parquet (fixture scale).
    seen_buckets: int = 0
    # Codec for the state tables.  These are engine-internal round deltas
    # re-read within the same crawl, not user-facing outputs, so the
    # default favors write+read CPU over ratio (snappy) instead of the
    # session-wide zstd used for published parquet.  Parameterised for
    # clusters where state lives on slow/remote storage and ratio wins:
    # SPARK_GRAFT_STATE_CODEC=zstd.
    delta_codec: str = os.environ.get("SPARK_GRAFT_STATE_CODEC", "snappy")

    def __post_init__(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    # ---------------------------------------------------------------- commits
    def _marker_path(self, round_id: int) -> str:
        return os.path.join(self.root, f"_committed_round_{round_id:06d}.json")

    def committed_round(self) -> int:
        """Highest committed round id, or -1."""
        rounds = [
            int(name[len("_committed_round_") : -len(".json")])
            for name in os.listdir(self.root)
            if name.startswith("_committed_round_") and name.endswith(".json")
        ]
        return max(rounds, default=-1)

    def commit_round(self, round_id: int, summary: dict) -> None:
        """Atomically publish a round (write marker last, via os.replace)."""
        payload = dict(summary)
        payload["round"] = round_id
        payload["committed_at_unix"] = time.time()
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(payload, fh, sort_keys=True)
        os.replace(tmp, self._marker_path(round_id))

    def round_summary(self, round_id: int) -> dict:
        with open(self._marker_path(round_id)) as fh:
            return json.load(fh)

    # ----------------------------------------------------------------- tables
    def delta_path(self, table: str, round_id: int) -> str:
        return os.path.join(self.root, table, f"round={round_id}")

    # ---------------------------------------------------- bucketed seen table
    def _seen_table_name(self) -> str:
        return "seen_b_" + hashlib.md5(self.root.encode()).hexdigest()[:12]

    def _seen_location(self) -> str:
        return os.path.join(self.root, "seen_bucketed")

    def _ensure_seen_table(self, spark: SparkSession) -> str:
        """Register the bucketed seen table in this session's catalog
        (idempotent; re-registers over existing files after a restart)."""
        name = self._seen_table_name()
        if not spark.catalog.tableExists(name) and os.path.isdir(
            self._seen_location()
        ):
            spark.sql(
                f"CREATE TABLE {name} "
                "(url STRING, host STRING, reason STRING, round_seen INT) "
                "USING PARQUET CLUSTERED BY (url) SORTED BY (url) "
                f"INTO {self.seen_buckets} BUCKETS "
                f"LOCATION '{self._seen_location()}'"
            )
        return name

    def _write_seen_bucketed(
        self, df: DataFrame, round_id: int, refresh: bool = True
    ) -> None:
        """Append one round's seen delta, bucketed by url.

        Append-only + duplicate-tolerant: the anti-join treats seen as a
        set, and reads filter ``round_seen <= committed``, so a crashed
        (uncommitted) append needs no cleanup — re-running the round just
        appends the same rows again, invisibly.

        ``refresh=False`` defers the catalog refresh to
        :meth:`refresh_seen` — REQUIRED when other jobs whose plans
        reference the seen table run concurrently with this append:
        ``refreshTable`` invalidates every cached plan containing the
        table (Spark's recacheByPlan), and an in-flight job whose
        InMemoryTableScan gets invalidated under it can silently lose the
        cached subtree's rows (observed: new_urls evaluating empty in the
        overlapped round writes).  With the refresh deferred, every
        in-round job keeps the ROUND-START table snapshot — which is also
        the correct read semantics for the round.
        """
        spark = df.sparkSession
        name = self._ensure_seen_table(spark)
        (
            # repartition on url with N partitions aligns tasks to buckets
            # (same murmur3 hash both places): one file per bucket per
            # round instead of tasks x buckets small files
            df.select(*SEEN_COLS)
            .repartition(self.seen_buckets, "url")
            .write.format("parquet")
            .bucketBy(self.seen_buckets, "url")
            .sortBy("url")
            .option("path", self._seen_location())
            .option("compression", self.delta_codec)
            .mode("append")
            .saveAsTable(name)
        )
        if refresh:
            spark.catalog.refreshTable(name)

    def refresh_seen(self, spark: SparkSession) -> None:
        """Publish a deferred bucketed-seen append to this session's
        catalog (no-op for the unbucketed layout)."""
        if self.seen_buckets > 0 and spark.catalog.tableExists(
            self._seen_table_name()
        ):
            spark.catalog.refreshTable(self._seen_table_name())

    def write_delta(
        self, df: DataFrame, table: str, round_id: int, refresh: bool = True
    ) -> None:
        """Write one round's delta for a table.  ``overwrite`` keeps replay
        idempotent: a crashed, uncommitted round is silently rewritten.

        The ``round`` column, if present, is carried by the partition
        directory name (``round=<k>``) and re-inferred at read time, so it
        is stripped from the physical files.  ``refresh`` is forwarded to
        the bucketed-seen append (see :meth:`_write_seen_bucketed`).
        """
        if table == "seen" and self.seen_buckets > 0:
            self._write_seen_bucketed(df, round_id, refresh=refresh)
            return
        if "round" in df.columns:
            df = df.drop("round")
        df.write.mode("overwrite").option(
            "compression", self.delta_codec
        ).parquet(self.delta_path(table, round_id))

    def read_round_delta(
        self, spark: SparkSession, table: str, round_id: int
    ) -> DataFrame | None:
        """Read exactly one round's delta (no union over history, no
        filter): the plan stays O(1) in crawl length instead of growing a
        unioned scan per round — per-round Catalyst analysis time is a
        serial cost that does not shrink with executors."""
        path = self.delta_path(table, round_id)
        if not os.path.isdir(path):
            return None
        return spark.read.parquet(path)

    def read_table(
        self, spark: SparkSession, table: str, upto_round: int | None = None
    ) -> DataFrame | None:
        """Union of committed deltas (round <= upto_round), partition-pruned.

        Returns None when the table has no committed data yet (callers
        supply their own empty frame with the right schema).
        """
        if upto_round is None:
            upto_round = self.committed_round()
        if upto_round < 0:
            return None
        if table == "seen" and self.seen_buckets > 0:
            if not os.path.isdir(self._seen_location()):
                return None
            name = self._ensure_seen_table(spark)
            from pyspark.sql import functions as F

            return spark.table(name).where(F.col("round_seen") <= upto_round)
        base = os.path.join(self.root, table)
        if not os.path.isdir(base):
            return None
        existing = [
            r
            for r in range(upto_round + 1)
            if os.path.isdir(self.delta_path(table, r))
        ]
        if not existing:
            return None
        df = spark.read.option("basePath", base).parquet(
            *[self.delta_path(table, r) for r in existing]
        )
        return df

    def drop_uncommitted(self) -> None:
        """Remove delta dirs newer than the last committed round (crash
        debris); called on resume before re-running the next round."""
        committed = self.committed_round()
        for table in TABLES:
            # round r legitimately *produces* the frontier delta for r+1,
            # so the frontier table keeps one delta beyond the marker
            keep_upto = committed + 1 if table == "frontier" else committed
            base = os.path.join(self.root, table)
            if not os.path.isdir(base):
                continue
            for name in os.listdir(base):
                if not name.startswith("round="):
                    continue
                r = int(name.split("=", 1)[1])
                if r > keep_upto:
                    shutil.rmtree(os.path.join(base, name), ignore_errors=True)
