"""LakeTable — parquet + JSON-manifest table format with MERGE semantics.

The design point is an Iceberg table (SURVEY.md section 7 M2); the Iceberg
runtime jar cannot be sourced in this offline sandbox, so this module
implements the documented fallback: the same transactional surface —
snapshot-isolated commits, MERGE INTO upsert/delete, additive schema
evolution, time travel by version — on plain parquet with a tiny
JSON manifest layer. The public API is format-agnostic; swapping in real
Iceberg means replacing this module only.

Layout (all under one table root):

    _manifests/v{N:08d}.json   -- one per commit; atomic os.rename publish
    data/commit-{N:08d}/*.parquet
    _markers/{batch_id}.json   -- exactly-once ledger (see catalog.py)
    _lineage/                  -- per-batch per-partition metrics parquet

Manifest = {version, parent, batch_id, schema(json), n_buckets,
bucket_map, files:[{path, pindex, rows, min_key, max_key}]} where
key = repo || '\\x00' || path (sortable composite key) and
bucket = pmod(xxhash64(repo, path), n_buckets) (hash-bucketed layout).

Scale notes (why this survives 100 TB):
- MERGE is copy-on-write **per affected file**, not per table: the table
  is **hash-bucketed** on the merge key (Hive/Iceberg-bucketing style) —
  every file records which shuffle bucket it holds, so the affected-file
  set is exactly {files whose bucket appears among the batch's key
  buckets}: a tiny distinct-aggregate on the batch, zero table scan.
  A 10^10-row table touched by a 10^6-row batch rewrites only the
  buckets the batch's keys land in.
- Bucketing beats range-partitioning here twice over: pruning is exact on
  key equality (MERGE is an equi-join), and the write needs no
  RangePartitioner sampling pass (which costs an extra computation of the
  merged state). Files stay sorted by key within each bucket, and per-file
  key min/max are still recorded as a fallback prune for legacy files.
- Reads use the manifest's explicit schema (``spark.read.schema``), so no
  footer-merging scan (``mergeSchema``) is ever needed, and old files
  simply surface nulls for columns added later — additive evolution.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pyorchdb_spark.operators.dedup import DEFAULT_KEYS
from pyorchdb_spark.plans.merge import resolve_merge

KEY_SEP = "\x00"


def composite_key(keys: Sequence[str] = DEFAULT_KEYS):
    return F.concat_ws(KEY_SEP, *[F.col(k) for k in keys])


def bucket_expr(keys: Sequence[str], n_buckets: int):
    """Stable key bucket: pmod(xxhash64(keys), n) — layout + prune unit."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))


@dataclass
class Manifest:
    version: int
    parent: int | None
    batch_id: str | None
    schema_json: str
    files: list[dict] = field(default_factory=list)
    n_buckets: int | None = None
    bucket_map: list[int] | None = None  # bucket value -> shuffle partition index

    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self.schema_json))

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "parent": self.parent,
                "batch_id": self.batch_id,
                "schema": json.loads(self.schema_json),
                "n_buckets": self.n_buckets,
                "bucket_map": self.bucket_map,
                "files": self.files,
            }
        )

    @staticmethod
    def from_json(text: str) -> "Manifest":
        d = json.loads(text)
        return Manifest(
            version=d["version"],
            parent=d.get("parent"),
            batch_id=d.get("batch_id"),
            schema_json=json.dumps(d["schema"]),
            files=d["files"],
            n_buckets=d.get("n_buckets"),
            bucket_map=d.get("bucket_map"),
        )


class ConcurrentCommitError(RuntimeError):
    """Another writer published this manifest version first."""


class LakeTable:
    """One keyed lake table at a directory root."""

    def __init__(self, spark: SparkSession, root: str, keys: Sequence[str] = DEFAULT_KEYS):
        self.spark = spark
        self.root = os.path.abspath(root)
        self.keys = tuple(keys)
        os.makedirs(os.path.join(self.root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)

    def _bucket_map(self, n: int) -> list[int]:
        """bucket value b -> shuffle partition index under repartition(n, expr).

        Spark's HashPartitioning = pmod(murmur3(expr value), n); computed
        once per table with a tiny n-row job and stored in the manifest so
        merge-time pruning is pure driver-side arithmetic.
        """
        rows = (
            self.spark.range(n)
            .select(F.col("id").alias("b"), F.pmod(F.hash(F.col("id")), F.lit(n)).alias("p"))
            .collect()
        )
        out = [0] * n
        for r in rows:
            out[r["b"]] = r["p"]
        return out

    # ---------- manifest plumbing ----------

    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    def current_version(self) -> int | None:
        versions = [
            int(m.group(1))
            for f in os.listdir(self._manifest_dir())
            if (m := re.fullmatch(r"v(\d{8})\.json", f))
        ]
        return max(versions) if versions else None

    def manifest(self, version: int | None = None) -> Manifest | None:
        version = version if version is not None else self.current_version()
        if version is None:
            return None
        with open(os.path.join(self._manifest_dir(), f"v{version:08d}.json")) as fh:
            return Manifest.from_json(fh.read())

    def _publish(self, manifest: Manifest) -> None:
        """Atomic commit: write temp file, rename into place (no overwrite)."""
        target = os.path.join(self._manifest_dir(), f"v{manifest.version:08d}.json")
        fd, tmp = tempfile.mkstemp(dir=self._manifest_dir(), suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            fh.write(manifest.to_json())
        if os.path.exists(target):
            os.unlink(tmp)
            raise ConcurrentCommitError(target)
        os.rename(tmp, target)

    # ---------- read path ----------

    def snapshot(self, version: int | None = None, include_tombstones: bool = False) -> DataFrame:
        """Table state at a version (default: latest). Empty table → empty DF.

        Stored state retains tombstone rows (op='delete') so out-of-order
        late events can never resurrect a deleted key (plans/merge.py);
        user-facing reads filter them unless ``include_tombstones``.
        """
        m = self.manifest(version)
        if m is None or not m.files:
            schema = m.schema() if m else StructType()
            df = self.spark.createDataFrame([], schema)
        else:
            paths = [os.path.join(self.root, f["path"]) for f in m.files]
            df = self.spark.read.schema(m.schema()).parquet(*paths)
        if not include_tombstones and "op" in df.columns:
            df = df.filter(F.col("op") != "delete").drop("op")
        return df

    def is_empty(self) -> bool:
        m = self.manifest()
        return m is None or not m.files

    # ---------- write path ----------

    def _write_data_files(self, df: DataFrame, version: int, n_buckets: int) -> list[dict]:
        """Write rows hash-bucketed by key, sorted by key within each file.

        One hash shuffle (no RangePartitioner sampling pass), one file per
        non-empty bucket; the file name's partition index identifies its
        bucket set for exact merge-time pruning.
        """
        out_rel = f"data/commit-{version:08d}"
        out_dir = os.path.join(self.root, out_rel)
        key = composite_key(self.keys)
        (
            df.repartition(n_buckets, bucket_expr(self.keys, n_buckets))
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        written = self.spark.read.schema(df.schema).parquet(out_dir)
        stats = (
            written.groupBy(F.input_file_name().alias("file"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min(key).alias("min_key"),
                F.max(key).alias("max_key"),
            )
            .collect()
        )
        out = []
        for r in stats:
            p = r["file"]
            p = p[7:] if p.startswith("file://") else p
            base = os.path.basename(p)
            mm = re.match(r"part-(\d+)", base)
            out.append(
                {
                    "path": os.path.join(out_rel, base),
                    "pindex": int(mm.group(1)) if mm else None,
                    "rows": r["rows"],
                    "min_key": r["min_key"],
                    "max_key": r["max_key"],
                }
            )
        # Empty buckets may leave zero-row part files; they carry no data
        # and would dangle unreferenced — remove them eagerly.
        referenced = {os.path.basename(f["path"]) for f in out}
        for fname in os.listdir(out_dir):
            if fname.endswith(".parquet") and fname not in referenced:
                os.unlink(os.path.join(out_dir, fname))
        return sorted(out, key=lambda f: f["path"])

    def _affected_files(self, m: Manifest, source: DataFrame) -> tuple[list[dict], list[dict]]:
        """Split manifest files into (affected, untouched) for this batch.

        Bucketed path (normal): the batch's distinct key buckets (a tiny
        partial-aggregated distinct over the batch) map through the stored
        bucket_map to shuffle partition indices; affected = files holding
        one of those indices. Exact for an equi-key MERGE, no table scan.

        Fallback (files lacking a bucket index): key-range overlap via a
        broadcast nested-loop join against per-file min/max keys.
        """
        if not m.files:
            return [], []
        bucketed = [f for f in m.files if f.get("pindex") is not None]
        legacy = [f for f in m.files if f.get("pindex") is None]
        affected: list[dict] = []
        untouched: list[dict] = []

        if bucketed and m.n_buckets and m.bucket_map:
            hit_p = {
                m.bucket_map[r["b"]]
                for r in source.select(
                    bucket_expr(self.keys, m.n_buckets).alias("b")
                )
                .distinct()
                .collect()
            }
            for f in bucketed:
                (affected if f["pindex"] in hit_p else untouched).append(f)
        else:
            legacy = m.files

        if legacy:
            bounds = self.spark.createDataFrame(
                [(f["path"], f["min_key"], f["max_key"]) for f in legacy],
                "path string, min_key string, max_key string",
            )
            skeys = source.select(composite_key(self.keys).alias("k")).distinct()
            hit = (
                skeys.join(
                    F.broadcast(bounds),
                    (F.col("k") >= F.col("min_key")) & (F.col("k") <= F.col("max_key")),
                    "inner",
                )
                .select("path")
                .distinct()
                .collect()
            )
            hit_paths = {r["path"] for r in hit}
            for f in legacy:
                (affected if f["path"] in hit_paths else untouched).append(f)
        return affected, untouched

    @staticmethod
    def _evolve_schema(old: StructType, batch_schema: StructType) -> StructType:
        """Additive evolution: append columns the target hasn't seen.

        Maps the reference's "a later file introduces a new column"
        behavior (pandas concat fills NaN) to explicit schema DDL — the
        Iceberg ALTER TABLE ADD COLUMNS analogue (SURVEY.md section 4.3).
        Type changes are rejected: evolution here is additive only.
        """
        have = {f.name: f for f in old.fields}
        fields = list(old.fields)
        for f in batch_schema.fields:
            if f.name not in have:
                fields.append(f)
            elif have[f.name].dataType != f.dataType:
                raise ValueError(
                    f"non-additive schema change on column {f.name!r}: "
                    f"{have[f.name].dataType} -> {f.dataType}"
                )
        return StructType(fields)

    def merge(
        self,
        source_events: DataFrame,
        batch_id: str | None = None,
        *,
        salted: bool = False,
        n_salts: int = 16,
        num_files: int | None = None,
    ) -> Manifest:
        """MERGE INTO this table: upsert/delete with LWW-by-seq semantics.

        Copy-on-write over affected files only. Idempotent: merging the
        same batch twice yields byte-identical state.
        """
        m = self.manifest()
        version = (m.version if m else 0) + 1
        # Bucket layout is fixed at table creation; later merges must use
        # the stored count or bucket->file pruning would break.
        if m is not None and m.n_buckets:
            n_buckets = m.n_buckets
            bucket_map = m.bucket_map
        else:
            n_buckets = num_files or int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            bucket_map = self._bucket_map(n_buckets)
        # Stored schema = full event envelope including op (tombstone
        # retention — see plans/merge.py module docstring).
        state_schema = source_events.schema

        if m is None or not m.files:
            merged = resolve_merge(
                self.spark.createDataFrame([], state_schema),
                source_events,
                keys=self.keys,
                salted=salted,
                n_salts=n_salts,
            )
            new_schema = state_schema if m is None else self._evolve_schema(m.schema(), state_schema)
            untouched: list[dict] = []
        else:
            new_schema = self._evolve_schema(m.schema(), state_schema)
            affected, untouched = self._affected_files(m, source_events)
            if affected:
                paths = [os.path.join(self.root, f["path"]) for f in affected]
                target_rows = self.spark.read.schema(m.schema()).parquet(*paths)
            else:
                target_rows = self.spark.createDataFrame([], m.schema())
            merged = resolve_merge(
                target_rows, source_events, keys=self.keys, salted=salted, n_salts=n_salts
            )

        # Align to evolved schema (stable column order across commits).
        merged = merged.select(*[F.col(f.name) for f in new_schema.fields])
        new_files = self._write_data_files(merged, version, n_buckets)
        manifest = Manifest(
            version=version,
            parent=m.version if m else None,
            batch_id=batch_id,
            schema_json=json.dumps(new_schema.jsonValue()),
            files=sorted(untouched + new_files, key=lambda f: f["path"]),
            n_buckets=n_buckets,
            bucket_map=bucket_map,
        )
        self._publish(manifest)
        return manifest

    def overwrite(self, df: DataFrame, batch_id: str | None = None, num_files: int | None = None) -> Manifest:
        """Replace the whole table state (initial load / test setup)."""
        m = self.manifest()
        version = (m.version if m else 0) + 1
        if m is not None and m.n_buckets:
            n_buckets, bucket_map = m.n_buckets, m.bucket_map
        else:
            n_buckets = num_files or int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            bucket_map = self._bucket_map(n_buckets)
        new_files = self._write_data_files(df, version, n_buckets)
        manifest = Manifest(
            version=version,
            parent=m.version if m else None,
            batch_id=batch_id,
            schema_json=json.dumps(df.schema.jsonValue()),
            files=new_files,
            n_buckets=n_buckets,
            bucket_map=bucket_map,
        )
        self._publish(manifest)
        return manifest

    # ---------- maintenance ----------

    def compact(self, tombstone_watermark_seq: int | None = None, num_files: int | None = None) -> Manifest:
        """Rewrite the table dropping GC-able tombstones.

        A tombstone with ``seq <= tombstone_watermark_seq`` can be dropped
        once the ingest low-watermark guarantees no event with a lower seq
        can still arrive (Kafka-compaction contract). With no watermark,
        all tombstones are dropped (safe only after the log is fully
        replayed).
        """
        m = self.manifest()
        if m is None:
            raise ValueError("nothing to compact")
        df = self.snapshot(include_tombstones=True)
        if "op" in df.columns:
            keep = F.col("op") != "delete"
            if tombstone_watermark_seq is not None:
                keep = keep | (F.col("seq") > tombstone_watermark_seq)
            df = df.filter(keep)
        version = m.version + 1
        n_buckets = m.n_buckets or num_files or int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        new_files = self._write_data_files(df, version, n_buckets)
        manifest = Manifest(
            version=version,
            parent=m.version,
            batch_id=f"compact-{version}",
            schema_json=m.schema_json,
            files=new_files,
            n_buckets=n_buckets,
            bucket_map=m.bucket_map or self._bucket_map(n_buckets),
        )
        self._publish(manifest)
        return manifest

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data files unreferenced by the newest ``keep_versions``
        manifests (time-travel GC). Returns deleted relative paths."""
        cur = self.current_version()
        if cur is None:
            return []
        keep = set()
        kept_versions = range(max(1, cur - keep_versions + 1), cur + 1)
        for v in kept_versions:
            mf = self.manifest(v)
            if mf:
                keep.update(f["path"] for f in mf.files)
        deleted = []
        data_root = os.path.join(self.root, "data")
        for commit_dir in sorted(os.listdir(data_root)):
            cdir = os.path.join(data_root, commit_dir)
            for fname in os.listdir(cdir):
                rel = os.path.join("data", commit_dir, fname)
                if rel not in keep and fname.endswith(".parquet"):
                    os.unlink(os.path.join(cdir, fname))
                    deleted.append(rel)
        # drop manifests older than the keep window
        for f in os.listdir(self._manifest_dir()):
            if (mm := re.fullmatch(r"v(\d{8})\.json", f)) and int(mm.group(1)) < min(kept_versions):
                os.unlink(os.path.join(self._manifest_dir(), f))
        return deleted
