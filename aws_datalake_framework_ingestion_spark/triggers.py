"""Event-driven trigger plane (SURVEY.md §2.6 T3): file-drop → pipeline.

The reference wires S3 ObjectCreated events through a Lambda that
parses ``src_sys_id``/``asset_id`` out of the object key and POSTs an
Airflow dagRun (airflow/dag_trigerrer/dag_trigerrer.py:9-31).  The
Spark-native analog keeps the same contract — *a file landing under
``{watch_root}/{src_sys_id}/{asset_id}/`` triggers that asset's
pipeline run* — but replaces the Lambda/REST plumbing with file-source
discovery: a scan finds unconsumed drops, dispatches
``pipeline.run_asset`` per file, and archives the drop into an
``_ingested/`` subdir (the reference's processed-file move, K3) so the
scan is idempotent and restart-safe.

At production scale the same loop IS Structured Streaming's file
source (streaming/merge.py uses it with cleanSource=archive); this
module keeps the per-asset dispatch variant, where each discovered
file fans out to a full DQ→mask→publish pipeline rather than into one
long-running query.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from .catalog import Catalog
from .pipeline import AssetSpec, run_asset

_INGESTED = "_ingested"


@dataclass(frozen=True)
class DropEvent:
    """One discovered drop (the parsed S3-event analog)."""

    src_sys_id: int
    asset_id: int
    path: str


def parse_drop_path(watch_root: str, path: str) -> DropEvent | None:
    """``{watch_root}/{src_sys_id}/{asset_id}/{file}`` → DropEvent —
    the key-parsing step of the reference Lambda (dag_trigerrer.py:14-
    22 splits the S3 key the same way).  Returns None for paths that
    don't match the layout (foreign files are ignored, not fatal).

    Scheme-agnostic: either argument may be a plain path or a URI
    (``file:/...``, ``s3a://...``) — comparison happens on the parsed
    path component, so a qualified listing against an unqualified
    watch root still matches."""
    from urllib.parse import urlparse

    root = urlparse(watch_root).path.rstrip("/")
    p = urlparse(path).path
    if not p.startswith(root + "/"):
        return None
    parts = p[len(root) + 1 :].split("/")
    if len(parts) != 3 or parts[2].startswith((".", "_")):
        return None
    try:
        return DropEvent(int(parts[0]), int(parts[1]), path)
    except ValueError:
        return None


class DropWatcher:
    """Poll a watch directory and run the pipeline for each new drop.

    ``specs`` maps (src_sys_id, asset_id) → AssetSpec; drops for
    unregistered assets are left in place (they may register later —
    same as the reference, where an unknown key 404s the dagRun and
    the object stays in the bucket).
    """

    def __init__(
        self,
        catalog: Catalog,
        watch_root: str,
        specs: dict[tuple[int, int], AssetSpec],
        work_root: str,
        fmt: str = "csv",
    ) -> None:
        self.catalog = catalog
        self.watch_root = watch_root
        self.specs = specs
        self.work_root = work_root
        self.fmt = fmt

    def _discover(self) -> list[DropEvent]:
        # Hadoop FS recursive listing (scheme-agnostic — the watch
        # root is an S3 bucket in the reference's deployment; a local
        # os.walk would discover nothing there)
        from .sources.files import _fs

        fs, jvm = _fs(self.catalog.spark, self.watch_root)
        root = jvm.org.apache.hadoop.fs.Path(self.watch_root)
        if not fs.exists(root):
            return []
        out = []
        it = fs.listFiles(root, True)
        while it.hasNext():
            p = it.next().getPath().toString()
            if f"/{_INGESTED}/" in p:
                continue
            ev = parse_drop_path(self.watch_root, p)
            if ev is not None and (ev.src_sys_id, ev.asset_id) in self.specs:
                out.append(ev)
        return sorted(out, key=lambda e: e.path)

    def _read(self, path: str):
        spark = self.catalog.spark
        if self.fmt == "csv":
            return spark.read.option("header", True).option(
                "inferSchema", True
            ).csv(path)
        if self.fmt == "json":
            return spark.read.json(path)
        if self.fmt == "parquet":
            return spark.read.parquet(path)
        raise ValueError(f"unsupported drop format: {self.fmt!r}")

    def _archive(self, ev: DropEvent) -> None:
        from .sources.files import _fs

        fs, jvm = _fs(self.catalog.spark, ev.path)
        P = jvm.org.apache.hadoop.fs.Path
        src = P(ev.path)
        dest_dir = P(f"{src.getParent().toString().rstrip('/')}/{_INGESTED}")
        fs.mkdirs(dest_dir)
        if not fs.rename(src, P(f"{dest_dir.toString()}/{src.getName()}")):
            raise IOError(f"archive failed for {ev.path}")

    def scan_once(self) -> list[str]:
        """One discovery pass: run the pipeline for every unconsumed
        drop, archive it, return the exec_ids started.  A failing
        pipeline leaves its drop un-archived (retried next scan) after
        the failure status is on the ledger — fail fast, no blanket
        except (SURVEY.md §4.3)."""
        exec_ids = []
        for ev in self._discover():
            spec = self.specs[(ev.src_sys_id, ev.asset_id)]
            exec_ids.append(
                run_asset(
                    self.catalog, spec, self._read(ev.path), self.work_root
                )
            )
            self._archive(ev)
        return exec_ids

    def watch(self, poll_seconds: float = 1.0, max_cycles: int = 10) -> list[str]:
        """T4-style polling loop over scan_once — the time-driven
        trigger running the event-driven one (bounded for tests; in
        production this is a scheduler entry or a streaming query)."""
        all_ids = []
        for _ in range(max_cycles):
            all_ids.extend(self.scan_once())
            time.sleep(poll_seconds)
        return all_ids
