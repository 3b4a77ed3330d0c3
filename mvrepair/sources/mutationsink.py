"""Mutation sink as a Spark 4 Python DataSource WRITER — the repair
apply leg (reference O14/O15: MvSync applies upsert/delete mutations
per row) executing under Spark's task-commit protocol instead of a
bare file dump.

Semantics modeled on the connector's batched mutation path:
- each TASK writes its rows to an UNCOMMITTED spill file
  (``part-<uuid>.jsonl.tmp``) and returns a commit message carrying the
  file name + row count;
- ``commit`` runs ONCE on the driver after every task succeeded: it
  renames each spill to its final name and writes a ``_MANIFEST`` line
  per file (name + rows) — readers trust ONLY manifested files, so a
  torn job is invisible (the exactly-once-per-job story a mutation log
  needs before anyone replays it against a cluster);
- ``abort`` deletes the spills, leaving the directory contentless.

Speculative/retried tasks each write their own uuid-named spill; only
the files named in the SUCCESSFUL tasks' commit messages get
manifested, so duplicate task attempts cannot double-apply — the same
guarantee FileCommitProtocol gives parquet, rebuilt at the Python
data-source layer where a CQL batch writer would sit.

The JSONL cell format matches ``sources/corpus.py``'s quarantine-ready
reader conventions (one object per line, explicit schema on read).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST"


@dataclass
class SpillCommit(WriterCommitMessage):
    spill_name: str
    n_rows: int


class MutationSinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mutation sink requires option 'path'")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return SpillCommit(spill_name=name, n_rows=n)

    def commit(self, messages):
        entries = []
        for m in messages:
            if m is None:
                continue
            final = m.spill_name[: -len(".tmp")]
            os.rename(
                os.path.join(self.path, m.spill_name),
                os.path.join(self.path, final),
            )
            entries.append({"file": final, "rows": m.n_rows})
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            for e in sorted(entries, key=lambda e: e["file"]):
                f.write(json.dumps(e, sort_keys=True) + "\n")

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.spill_name))
            except FileNotFoundError:
                pass


class MutationSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "mvrepair_mutation_sink"

    def writer(self, schema, overwrite):
        return MutationSinkWriter(self.options)


def read_manifested(spark, path: str, schema: str):
    """Read ONLY the manifested cells back (a torn job has no manifest
    and therefore no visible rows), with the manifest's per-file row
    counts asserted against what the files actually hold."""
    manifest = os.path.join(path, MANIFEST)
    files = []
    expected = {}
    with open(manifest) as f:
        for line in f:
            e = json.loads(line)
            files.append(os.path.join(path, e["file"]))
            expected[e["file"]] = e["rows"]
    df = spark.read.schema(schema).json(files)
    total = sum(expected.values())
    actual = df.count()
    if actual != total:
        raise ValueError(
            f"manifest promises {total} rows, files hold {actual}"
        )
    return df
