"""Custom verified-archive writer (SURVEY.md §2.1 S4): a Python Data
Source writer whose COMMIT records per-file md5 digests.

The reference's sink uploads one file at a time, asks the server for
its md5Checksum, recomputes locally, and raises on mismatch (reference
src/01-scrape-images.py:98-132, compute_md5 :78-83).  Spark's commit
protocol does this better: each task writes a part file and returns a
WriterCommitMessage carrying (name, row count, md5); only the driver's
``commit`` — which runs iff every task succeeded — publishes the
manifest.  A failed/duplicate task attempt never corrupts the dataset
because its message is simply never committed (exactly the semantics
the reference approximates with per-file retry + verify).

The manifest is the audit artifact: ``verify_archive`` recomputes every
part file's digest and count against it — the verify-month op at file
granularity (sinks/verified.py audits at partition granularity).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

SINK_NAME = "verified_archive"
MANIFEST = "_MANIFEST.json"


@dataclass
class PartCommit(WriterCommitMessage):
    filename: str
    n_rows: int
    md5: str


class ArchiveWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, rows: Iterator) -> PartCommit:
        """One task = one JSON-lines part file; the digest is computed
        over exactly the bytes written, so the commit message IS the
        integrity claim the audit later re-checks."""
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        h = hashlib.md5()
        n = 0
        with open(os.path.join(self.path, name), "wb") as f:
            for row in rows:
                line = (json.dumps(row.asDict(), default=str) + "\n").encode()
                f.write(line)
                h.update(line)
                n += 1
        return PartCommit(filename=name, n_rows=n, md5=h.hexdigest())

    def commit(self, messages) -> None:
        """Runs only after EVERY task succeeded — publishing the
        manifest is the atomic 'the dataset exists' event.

        Commit also RECONCILES the directory to exactly the committed
        part set: tasks write into the final path, so a failed or
        speculative attempt (which never surfaces a commit message) and
        any prior generation's parts would otherwise linger as orphan
        .jsonl files that directory-level readers see but the manifest
        never lists.  Each commit fully defines the dataset (the
        manifest is rewritten wholesale — overwrite semantics, there is
        no manifest-merging append), so unlisted parts are deleted."""
        committed = {m.filename for m in messages}
        for name in os.listdir(self.path):
            if name.endswith(".jsonl") and name not in committed:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass  # best-effort; verify_archive flags survivors
        manifest = {
            "files": [
                {"name": m.filename, "n_rows": m.n_rows, "md5": m.md5}
                for m in messages
            ],
            "total_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class VerifiedArchiveDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SINK_NAME

    def writer(self, schema, overwrite: bool) -> ArchiveWriter:
        # The sink has overwrite semantics regardless of the save mode:
        # every commit rewrites the manifest wholesale and reconciles
        # the directory to the committed part set (see ArchiveWriter.
        # commit) — append would require manifest merging, which this
        # audit format deliberately does not do.
        return ArchiveWriter(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(VerifiedArchiveDataSource)


def verify_archive(path: str) -> list[str]:
    """Re-audit a committed archive: recompute each part's md5 and row
    count against the manifest.  Returns problem descriptions (empty =
    verified) — the reference's upload-verify (:126-131) replayable at
    any later time, not just at write time."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    problems: list[str] = []
    # Orphans first: part files on disk the manifest never lists mean a
    # directory-level reader sees phantom rows while the per-entry audit
    # below would still report clean.
    listed = {e["name"] for e in manifest["files"]}
    for name in sorted(os.listdir(path)):
        if name.endswith(".jsonl") and name not in listed:
            problems.append(f"orphan part file not in manifest: {name}")
    total = 0
    for entry in manifest["files"]:
        p = os.path.join(path, entry["name"])
        if not os.path.exists(p):
            problems.append(f"missing part file {entry['name']}")
            continue
        data = open(p, "rb").read()
        if hashlib.md5(data).hexdigest() != entry["md5"]:
            problems.append(f"digest mismatch in {entry['name']}")
        n = data.count(b"\n")
        total += n
        if n != entry["n_rows"]:
            problems.append(f"row count mismatch in {entry['name']}")
    if total != manifest["total_rows"]:
        problems.append("total row count mismatch")
    return problems
