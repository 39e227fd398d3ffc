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


# ---------------------------------------------------------------------------
# T4: time-driven trigger (the reference's per-asset Airflow
# ``schedule_interval``, dl_fmwrk_dag_template.py:23-34 — one DAG per
# asset, cron-shaped schedule).  Spark-native analog: cron specs live
# as DATA next to the asset specs, and a deterministic scheduler loop
# computes next-fire times and dispatches due assets through
# ``pipeline.run_asset``.  The clock is injected (``advance_to``), so
# ticks are simulated in tests and driven by any outer loop (cron,
# systemd timer, Airflow itself) in production — the scheduling
# DECISION, which is what the reference encodes per asset, is here.
# ---------------------------------------------------------------------------


class CronSpec:
    """Five-field cron expression (minute hour dom month dow).

    Supported syntax per field: ``*``, single values, ranges ``a-b``,
    lists ``a,b,c``, and steps ``*/n`` / ``a-b/n``.  Day-of-week uses
    cron numbering (0 = Sunday, 7 accepted as Sunday).  Day-of-month
    vs day-of-week follows Vixie cron: when BOTH are restricted the
    match is their OR; otherwise the restricted one applies.
    """

    def __init__(self, expr: str) -> None:
        parts = expr.split()
        if len(parts) != 5:
            raise ValueError(f"cron spec needs 5 fields: {expr!r}")
        self.expr = expr
        self.minute = self._field(parts[0], 0, 59)
        self.hour = self._field(parts[1], 0, 23)
        self.dom = self._field(parts[2], 1, 31)
        self.month = self._field(parts[3], 1, 12)
        dow = self._field(parts[4], 0, 7)
        self.dow = {0 if v == 7 else v for v in dow}
        self.dom_star = parts[2] == "*"
        self.dow_star = parts[4] == "*"

    @staticmethod
    def _field(spec: str, lo: int, hi: int) -> set[int]:
        vals: set[int] = set()
        for part in spec.split(","):
            step = 1
            if "/" in part:
                part, s = part.split("/", 1)
                step = int(s)
                if step < 1:
                    raise ValueError(f"cron step must be >= 1: {spec!r}")
            if part == "*":
                start, end = lo, hi
            elif "-" in part:
                a, b = part.split("-", 1)
                start, end = int(a), int(b)
            else:
                start = end = int(part)
            if start < lo or end > hi or start > end:
                raise ValueError(
                    f"cron field {spec!r} outside [{lo},{hi}]"
                )
            vals.update(range(start, end + 1, step))
        return vals

    def matches(self, dt) -> bool:
        if (
            dt.minute not in self.minute
            or dt.hour not in self.hour
            or dt.month not in self.month
        ):
            return False
        dom_ok = dt.day in self.dom
        # Python weekday(): Monday=0; cron: Sunday=0
        dow_ok = ((dt.weekday() + 1) % 7) in self.dow
        if self.dom_star and self.dow_star:
            return True
        if self.dom_star:
            return dow_ok
        if self.dow_star:
            return dom_ok
        return dom_ok or dow_ok

    def next_fire(self, after):
        """First matching minute strictly after ``after``."""
        from datetime import timedelta

        t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
        for _ in range(366 * 24 * 60):
            if self.matches(t):
                return t
            t += timedelta(minutes=1)
        raise ValueError(f"cron {self.expr!r} never fires within a year")


@dataclass(frozen=True)
class ScheduledAsset:
    """One asset on a schedule: the spec, its cron, and a source
    thunk (called at fire time — extraction reads CURRENT data, the
    same contract as the event path's per-drop read)."""

    spec: AssetSpec
    cron: CronSpec
    source: object  # Callable[[], DataFrame]


class CronScheduler:
    """Data-driven T4 loop: next-fire times computed from per-asset
    cron specs; due assets run through ``pipeline.run_asset`` with the
    tick as the run's logical timestamp.

    Catch-up semantics mirror the reference template's
    ``catchup=False`` (dl_fmwrk_dag_template.py:30): an asset whose
    schedule fired N times while the scheduler was down runs ONCE at
    the next tick, then its next fire is computed from that tick.
    A failing pipeline records its failure status on the ledger
    (fail-fast inside run_asset) and the asset STAYS scheduled — its
    next fire advances, the failed tick is not retried (same as a
    failed DAG run)."""

    def __init__(
        self,
        catalog: Catalog,
        assets: dict[str, ScheduledAsset],
        work_root: str,
        start,
    ) -> None:
        self.catalog = catalog
        self.assets = dict(assets)
        self.work_root = work_root
        self.next_fire = {
            name: sa.cron.next_fire(start) for name, sa in self.assets.items()
        }

    def due(self, now) -> list[str]:
        return sorted(
            n for n, t in self.next_fire.items() if t <= now
        )

    def advance_to(self, now) -> dict[str, str]:
        """Run every due asset once; returns {asset name: exec_id}.
        Next-fire times advance even when a run raises (the exception
        propagates AFTER bookkeeping so a bad asset can't wedge the
        loop into re-running it every tick).  When SEVERAL due assets
        fail in one tick, ALL failures propagate together as an
        ExceptionGroup (ADVICE r9 — previously only the first raised
        and the rest were dropped), and the successful runs' exec_ids
        are attached as ``exc.ran`` so callers can see what completed
        before deciding how to retry."""
        ran: dict[str, str] = {}
        errs: list[Exception] = []
        for name in self.due(now):
            sa = self.assets[name]
            self.next_fire[name] = sa.cron.next_fire(now)
            try:
                ran[name] = run_asset(
                    self.catalog,
                    sa.spec,
                    sa.source(),
                    self.work_root,
                    run_ts=now,
                )
            except Exception as e:  # noqa: BLE001 — re-raised below
                errs.append(e)
        if errs:
            grp = ExceptionGroup(
                f"{len(errs)} scheduled asset(s) failed this tick "
                f"({len(ran)} succeeded)",
                errs,
            )
            grp.ran = ran  # partial results for the caller
            raise grp
        return ran
