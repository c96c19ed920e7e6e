"""Custom stateful streaming operator (SURVEY §2.10 T5).

The reference's ``InsectDataStore`` is hand-rolled keyed state mutated
per message under a lock (reference consumer.py:21-148).  The Spark
re-spec is an ``applyInPandasWithState`` operator that maintains a
*mergeable sketch* per key across micro-batches — the
"continuously-maintained sketches in streaming" path SURVEY §4 marks as
the one genuine custom-code candidate:

- running event count           (≙ window counters, consumer.py:86-110)
- running value sum             (trend accumulation analog)
- slot-wise-min MinHash signature over user_id (≙ minwisehashing.py's
  accumulate-then-finalize, here never finalized: state IS the sketch)

Each micro-batch updates state in Arrow-batched pandas (no per-row
Python), and emits the key's current sketch — output mode ``update``.
State size is O(num_perm) per key regardless of stream length, which is
exactly why a sketch (and not a row buffer) is what survives 100 TB.

The per-slot hash is crc32 of ``f"{slot}:{user_id}"`` — deterministic
and process-independent, so the batch twin (``batch_sketch``) computed
via ``applyInPandas`` is bit-identical and the stream-batch equivalence
property is testable.
"""

from __future__ import annotations

import os
import zlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

NUM_PERM_DEFAULT = 16

OUTPUT_SCHEMA = (
    "event_type string, n bigint, total double, sig array<bigint>"
)
STATE_SCHEMA = "n bigint, total double, sig binary"


def _slot_hashes(user_ids: np.ndarray, num_perm: int) -> np.ndarray:
    """(num_perm, len(user_ids)) crc32 hashes — vectorized per slot."""
    out = np.empty((num_perm, len(user_ids)), dtype=np.int64)
    for slot in range(num_perm):
        out[slot] = [
            zlib.crc32(f"{slot}:{u}".encode()) for u in user_ids
        ]
    return out


def _accumulate(
    pdfs: Iterable[pd.DataFrame], n: int, total: float, sig: np.ndarray
) -> tuple[int, float, np.ndarray]:
    """Merge a batch of rows into (count, sum, slot-wise-min signature)."""
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        hashes = _slot_hashes(pdf["user_id"].to_numpy(), len(sig))
        sig = np.minimum(sig, hashes.min(axis=1))
    return n, total, sig


def _empty_sig(num_perm: int) -> np.ndarray:
    return np.full(num_perm, np.iinfo(np.int64).max, dtype=np.int64)


def running_sketch(
    keyed_events: DataFrame, num_perm: int = NUM_PERM_DEFAULT
) -> DataFrame:
    """Streaming keyed sketch: groupBy(event_type).applyInPandasWithState.

    ``keyed_events`` must have columns (event_type, user_id, value).
    Emits one row per key per micro-batch with the cumulative sketch.
    """

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, total, sig_bytes = state.get
            sig = np.frombuffer(sig_bytes, dtype=np.int64).copy()
        else:
            n, total, sig = 0, 0.0, _empty_sig(num_perm)
        n, total, sig = _accumulate(pdfs, n, total, sig)
        state.update((n, float(total), sig.tobytes()))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n": [n],
                "total": [float(total)],
                "sig": [sig.tolist()],
            }
        )

    return keyed_events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_sketch(
    events: DataFrame, num_perm: int = NUM_PERM_DEFAULT
) -> DataFrame:
    """Batch twin of ``running_sketch`` (same hashes, same output schema)
    for the stream-batch equivalence property (SURVEY §5.4)."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        n, total, sig = _accumulate([pdf], 0, 0.0, _empty_sig(num_perm))
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [n],
                "total": [float(total)],
                "sig": [sig.tolist()],
            }
        )

    return (
        events.select("event_type", "user_id", "value")
        .groupBy("event_type")
        .applyInPandas(agg, schema=OUTPUT_SCHEMA)
    )


# --- transformWithState (Spark 4.x) variant ----------------------------------

TWS_OUTPUT_SCHEMA = "event_type string, n bigint, total double"


def _install_pth_shim(target, name="ecostream_protobuf_vendor") -> bool:
    """Write ``<name>.pth`` → ``str(target)`` into the first writable
    site-packages dir.

    ``site`` reads ``.pth`` files at every CPython start, so any process
    spawned later — including the transformWithState driver worker the
    JVM forks with its OWN (pre-existing) environment — gets ``target``
    on ``sys.path`` without depending on who exported PYTHONPATH first.
    Idempotent: rewritten only when missing or stale.  Returns True when
    a current shim exists after the call.
    """
    import site

    target = str(target)
    candidates = []
    try:
        candidates.extend(site.getsitepackages())
    except AttributeError:
        pass  # virtualenv-embedded interpreters may lack it
    usersite = site.getusersitepackages() if site.ENABLE_USER_SITE else None
    if usersite:
        candidates.append(usersite)
    for sp in candidates:
        pth = os.path.join(sp, f"{name}.pth")
        try:
            if os.path.exists(pth):
                with open(pth, "r", encoding="utf-8") as fh:
                    if fh.read().strip() == target:
                        return True
            os.makedirs(sp, exist_ok=True)
            with open(pth, "w", encoding="utf-8") as fh:
                fh.write(target + "\n")
            return True
        except OSError:
            continue  # read-only site dir: try the next candidate
    return False


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable for the TWS state protocol.

    Prefers an installed protobuf; falls back to the vendored
    pure-Python runtime in ``ecostream/_vendor`` (see its README).  When
    ``spark`` is given, the vendor tree is also zipped and shipped via
    ``addPyFile`` so the Python *workers* (where the TWS state server
    runs) can import it too.  Returns False if neither is available.

    The TWS *driver worker* is a separate process the JVM spawns with
    the JVM's own PYTHONPATH — addPyFile does not reach it.  We export
    PYTHONPATH here as well, which covers any JVM launched afterwards;
    for a JVM that ALREADY exists (a harness that built its own
    SparkSession before importing us), the env export is too late, so
    we also drop a ``.pth`` shim into site-packages: ``site`` processes
    it at every interpreter start, which reaches the TWS driver worker
    regardless of launch order.  The shim is one line, idempotent, and
    harmless when protobuf later gets pip-installed (the real install
    shadows the vendor tree because site-packages itself sorts first on
    ``sys.path``... the vendor dir is appended by the .pth, and
    ``google.protobuf`` resolves from whichever comes first; the
    vendored runtime is version-matched to Spark 4's generated pb2
    modules either way).
    """
    import importlib
    import os
    import shutil as _sh
    import sys
    import tempfile
    from pathlib import Path

    # The TWS driver worker unpickles the StatefulProcessor BY MODULE
    # REFERENCE, so ``ecostream`` itself must be importable in a fresh
    # interpreter no matter what the worker's cwd is.  Under the
    # builder/driver harnesses cwd happens to be the repo root, which
    # masks the hole; a session started from any other directory hits
    # ModuleNotFoundError inside the forked worker (reproduced from
    # /tmp, round 11).  Same remedy as the vendor tree: PYTHONPATH for
    # JVMs launched after us, a .pth shim for JVMs that already exist —
    # the shim substitutes for the pip install a real deployment would
    # do.  Independent of protobuf, so it runs before the vendor logic.
    pkg_root = Path(__file__).resolve().parent.parent.parent
    pkg_dir = pkg_root / "ecostream"
    if (pkg_dir / "__init__.py").is_file():
        # Scope the shim: a .pth pointing at the repo ROOT would put
        # every top-level name there (tests/, tools/, bench.py) on
        # sys.path of EVERY future interpreter on the machine —
        # persistent global state that can shadow identically-named
        # installed packages in unrelated processes.  Point it instead
        # at a dir whose only entry is a symlink to the package, so the
        # shim exposes exactly one importable name: ``ecostream``.
        scoped = pkg_root / ".ecostream_syspath"
        shim_target = pkg_root  # fallback: filesystems without symlinks
        try:
            scoped.mkdir(exist_ok=True)
            link = scoped / "ecostream"
            if not (link / "__init__.py").is_file():
                if link.is_symlink():
                    link.unlink()
                link.symlink_to(pkg_dir, target_is_directory=True)
            if (link / "__init__.py").is_file():
                shim_target = scoped
        except OSError:
            pass
        existing = os.environ.get("PYTHONPATH", "")
        if str(shim_target) not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                str(shim_target) + (os.pathsep + existing if existing else "")
            )
        # _install_pth_shim rewrites on content mismatch, so a stale
        # shim from the repo-root era is re-scoped on first use.
        _install_pth_shim(shim_target, name="ecostream_pkg_root")

    vendored = False
    try:
        importlib.import_module("google.protobuf")
    except ImportError:
        vendor = Path(__file__).resolve().parent.parent / "_vendor"
        if not (vendor / "google" / "protobuf").is_dir():
            return False
        sys.path.insert(0, str(vendor))
        importlib.invalidate_caches()
        try:
            importlib.import_module("google.protobuf")
        except ImportError:
            return False
        vendored = True
        existing = os.environ.get("PYTHONPATH", "")
        if str(vendor) not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                str(vendor) + (os.pathsep + existing if existing else "")
            )
        _install_pth_shim(vendor)
    if spark is not None and vendored:
        zip_base = os.path.join(tempfile.gettempdir(), "ecostream_protobuf_vendor")
        zip_path = zip_base + ".zip"
        # Rebuild when any vendored file is newer than the cached zip —
        # an existence-only check would ship a stale runtime to workers
        # forever after the vendor tree is patched.
        newest = max(
            (p.stat().st_mtime for p in vendor.rglob("*") if p.is_file()),
            default=0.0,
        )
        if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest:
            # Build under a pid-suffixed name and os.replace() into the
            # shared cache path: make_archive is not atomic, and two
            # drivers on one host must never addPyFile a half-written
            # zip (same race the pid-suffixed scratch dirs avoid).
            tmp_base = f"{zip_base}.{os.getpid()}"
            _sh.make_archive(tmp_base, "zip", str(vendor))
            os.replace(tmp_base + ".zip", zip_path)
        try:
            spark.sparkContext.addPyFile(zip_path)
        except Exception:
            pass  # already added in this context
    return True


class RunningTotalsProcessor:
    """Spark 4 ``transformWithStateInPandas`` processor: per-key running
    (count, sum) in a ``ValueState``, optionally TTL'd.

    This is the modern successor of the ``applyInPandasWithState`` op
    above: typed state handles (value/list/map) with per-state TTL
    replace the single state tuple + timeout conf, which maps directly
    onto the reference's TTL'd keyed store (consumer.py:119-148) —
    state the engine expires per key instead of a hand-rolled purge
    loop over 7 dicts.  RocksDB state store required (the provider the
    scale path would run anyway: state spills off-heap, snapshots to
    the checkpoint).  Environment note: the TWS Python driver worker
    imports protobuf; containers without ``google.protobuf`` can import
    and construct this module but not run the query (test skips)."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", "n BIGINT, total DOUBLE", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._totals.exists():
            prev = self._totals.get()
            n, total = int(prev[0]), float(prev[1])
        else:
            n, total = 0, 0.0
        for pdf in rows:
            if len(pdf):
                n += len(pdf)
                total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "total": [total]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


TTL_EXPIRY_OUTPUT_SCHEMA = "user_id bigint, n bigint"


class TtlExpiryProcessor:
    """Event-time timer-based TTL expiry: the reference's purge loop as
    a Spark-4 TWS timer (consumer.py:119-148 walks 7 dicts under a lock
    deleting entries older than TTL; here the ENGINE fires a per-key
    timer when the watermark passes last-activity + TTL).

    Per user: ValueState (n, last_ms).  Each input batch advances the
    running count, deletes the previously registered timer, and
    re-registers at ``last_ms + ttl_ms`` — i.e. the key's expiry slides
    with activity, exactly a keyed-store TTL.  When the event-time
    watermark passes the timer, ``handleExpiredTimer`` emits the key's
    final (user_id, n) and clears state.  State per key is O(1); the
    timer index is the engine's (RocksDB), so 100 TB of keys never
    needs a driver-side purge scan.

    Determinism for the oracle: with the file-streamed events arriving
    in one micro-batch, the final watermark is ``max(ts) - delay`` and
    a key expires iff ``last_ms + ttl <= max_ms - delay_ms`` — a pure
    SQL predicate (see st19's oracle).
    """

    def __init__(self, ttl_ms: int):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._agg = handle.getValueState("agg", "n BIGINT, last_ms BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        if self._agg.exists():
            prev = self._agg.get()
            n, last_ms = int(prev[0]), int(prev[1])
            self._handle.deleteTimer(last_ms + self._ttl_ms)
        else:
            n, last_ms = 0, 0
        for pdf in rows:
            if len(pdf):
                n += len(pdf)
                batch_max = int(
                    pdf["ts"].astype("datetime64[ms]").astype("int64").max()
                )
                last_ms = max(last_ms, batch_max)
        self._agg.update((n, last_ms))
        self._handle.registerTimer(last_ms + self._ttl_ms)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self._agg.exists():
            prev = self._agg.get()
            yield pd.DataFrame({"user_id": [key[0]], "n": [int(prev[0])]})
            self._agg.clear()

    def close(self) -> None:
        pass


def ttl_expiry_tws(keyed_events: DataFrame, ttl_ms: int) -> DataFrame:
    """Streaming per-user TTL expiry via ``transformWithStateInPandas``
    with event-time timers.

    ``keyed_events``: streaming DataFrame with (user_id, ts) and a
    watermark already applied to ``ts`` (EventTime mode requires one).
    Emits one (user_id, n) row per key whose timer expired.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "_TtlExpiryTWS", (StatefulProcessor,), dict(TtlExpiryProcessor.__dict__)
    )
    return keyed_events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(ttl_ms),
        outputStructType=TTL_EXPIRY_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )


RECENT_K_OUTPUT_SCHEMA = "user_id bigint, rk bigint, ts_us bigint"


class RecentEventsProcessor:
    """TWS ``ListState``: per key, the K most-recent event timestamps —
    the bounded per-key buffer the reference hand-rolls as
    ``deque(maxlen=...)`` per insect (consumer.py:32-44), held in a
    typed engine-managed list instead of a Python object under a lock.

    Each batch merges the incoming timestamps into the stored list and
    trims to the K largest, so state is O(K) per key forever; the
    emitted (rank, ts) rows are per-rank MONOTONE non-decreasing across
    batches (new events only improve a rank), which is what makes the
    final ``max`` per (key, rank) slice deterministic for the oracle
    regardless of micro-batching."""

    def __init__(self, k: int = 5):
        self._k = k

    def init(self, handle) -> None:
        self._recent = handle.getListState("recent", "ts_us BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        cur = [int(r[0]) for r in self._recent.get()]
        for pdf in rows:
            if len(pdf):
                cur.extend(
                    int(x)
                    for x in pdf["ts"].astype("datetime64[us]").astype("int64")
                )
        cur = sorted(cur, reverse=True)[: self._k]
        self._recent.put([(v,) for v in cur])
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(cur),
                "rk": list(range(1, len(cur) + 1)),
                "ts_us": cur,
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def recent_events_tws(keyed_events: DataFrame, k: int = 5) -> DataFrame:
    """Streaming per-user recent-K buffer via ``transformWithStateInPandas``
    ListState.  ``keyed_events``: streaming DataFrame with (user_id, ts)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "_RecentEventsTWS", (StatefulProcessor,), dict(RecentEventsProcessor.__dict__)
    )
    return keyed_events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(k),
        outputStructType=RECENT_K_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


DAILY_MAP_OUTPUT_SCHEMA = "event_type string, n_days bigint, n bigint"


class DailyMapProcessor:
    """TWS ``MapState``: per key, a day → count map — the reference's
    per-window nested counter dicts (consumer.py:86-110 keeps
    ``{window: {key: count}}`` under a lock) as an engine-managed typed
    map the state store shards, snapshots, and can TTL per entry.

    Each batch pre-aggregates its rows per day in pandas (Arrow batch,
    no per-row Python against the state server), folds the partial
    counts into the map, and emits the key's current (n_days, n_total)
    — both MONOTONE across batches, so the final ``max`` slice is
    deterministic for the oracle regardless of micro-batching.  State
    per key is O(|distinct days|), the same bound the reference's purge
    loop enforces by deletion."""

    def init(self, handle) -> None:
        self._days = handle.getMapState("days", "day BIGINT", "cnt BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        for pdf in rows:
            if not len(pdf):
                continue
            days = (
                pdf["ts"].astype("datetime64[us]").astype("int64")
                // 86_400_000_000
            )
            for day, cnt in days.groupby(days).size().items():
                prev = (
                    self._days.getValue((int(day),))
                    if self._days.containsKey((int(day),))
                    else None
                )
                base = int(prev[0]) if prev is not None else 0
                self._days.updateValue((int(day),), (base + int(cnt),))
        n_days, total = 0, 0
        for _k, v in self._days.iterator():
            n_days += 1
            total += int(v[0])
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_days": [n_days], "n": [total]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def daily_map_tws(keyed_events: DataFrame) -> DataFrame:
    """Streaming per-type day→count map via ``transformWithStateInPandas``
    MapState.  ``keyed_events``: streaming DataFrame with (event_type, ts)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "_DailyMapTWS", (StatefulProcessor,), dict(DailyMapProcessor.__dict__)
    )
    return keyed_events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=proc_cls(),
        outputStructType=DAILY_MAP_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def running_totals_tws(keyed_events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Streaming keyed running totals via ``transformWithStateInPandas``.

    ``keyed_events``: streaming DataFrame with (event_type, value).
    Emits one row per key per micro-batch with the cumulative totals.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # Subclass at call time so the module imports even on Spark < 4.
    proc_cls = type(
        "_RunningTotalsTWS", (StatefulProcessor,), dict(RunningTotalsProcessor.__dict__)
    )
    return keyed_events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=proc_cls(ttl_ms),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_WINDOW_OUTPUT_SCHEMA = (
    "user_id bigint, start_us bigint, end_us bigint, n_events bigint"
)


def merge_session_intervals(intervals, points, gap_us):
    """Interval-union fold for gap sessionization: merge stored open
    sessions (start_us, end_us, n) with new event times, coalescing
    anything within ``gap_us``.  Strict > splits, matching t4's "gap >
    30min starts a new session" (an exactly-30min gap stays
    in-session there too).  ASSOCIATIVE over slicings: folding points
    in any batch partition and order yields the same final interval
    set as one fold over all points — the property that makes st23's
    state correct under arbitrary micro-batching (pinned by
    tests/test_round11_ops.py's randomized replay)."""
    items = sorted(intervals + [(t, t, 1) for t in points])
    merged = [items[0]]
    for start, end, n in items[1:]:
        ps, pe, pn = merged[-1]
        if start - pe > gap_us:
            merged.append((start, end, n))
        else:
            merged[-1] = (ps, max(pe, end), pn + n)
    return merged


class SessionWindowProcessor:
    """TWS SESSION WINDOWS with per-session event-time timers — the T4
    gap-sessionization the reference derives batch-side, run as typed
    state the engine closes: per user a ``ListState`` of open sessions
    (start_us, end_us, n) plus ONE registered timer per open session at
    ``end_ms + gap`` (st19 keeps one timer per key; this is the
    multi-timer surface).  Each batch merges its event times into the
    interval list (points coalesce with intervals when within the gap —
    the standard interval-union fold, so micro-batch slicing cannot
    change the final session set), re-registers the affected timers,
    and emits nothing.  When the watermark passes a session's
    ``end + gap``, no in-gap event can ever arrive (it would be late by
    definition), so ``handleExpiredTimer`` emits that session as FINAL
    and drops it from the list — sessions close one timer at a time,
    with no per-key scan.

    Determinism: session boundaries compare event gaps in exact integer
    MICROSECONDS (t4's rule, strict >); the close predicate uses the
    st19 millisecond-timer convention (``end_ms + gap_ms <= wm_ms``),
    replayed by the oracle as a pure SQL filter over the batch
    sessionization."""

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._sessions = handle.getListState(
            "sessions", "start_us BIGINT, end_us BIGINT, n BIGINT"
        )

    def _timer_ts(self, end_us: int) -> int:
        return end_us // 1000 + self._gap_ms

    def handleInputRows(self, key, rows, timerValues):
        cur = [(int(s[0]), int(s[1]), int(s[2])) for s in self._sessions.get()]
        pts = []
        for pdf in rows:
            if len(pdf):
                pts.extend(
                    int(x)
                    for x in pdf["ts"].astype("datetime64[us]").astype("int64")
                )
        if not pts:
            return iter(())
        for start, end, _ in cur:
            self._handle.deleteTimer(self._timer_ts(end))
        merged = merge_session_intervals(cur, pts, self._gap_ms * 1000)
        self._sessions.put(merged)
        for start, end, _ in merged:
            self._handle.registerTimer(self._timer_ts(end))
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        expiry = int(expiredTimerInfo.getExpiryTimeInMs())
        cur = [(int(s[0]), int(s[1]), int(s[2])) for s in self._sessions.get()]
        closed = [s for s in cur if self._timer_ts(s[1]) <= expiry]
        live = [s for s in cur if self._timer_ts(s[1]) > expiry]
        if live:
            self._sessions.put(live)
        else:
            self._sessions.clear()
        for start, end, n in closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "start_us": [start],
                    "end_us": [end],
                    "n_events": [n],
                }
            )

    def close(self) -> None:
        pass


def session_windows_tws(keyed_events: DataFrame, gap_ms: int) -> DataFrame:
    """Streaming gap-sessionization via ``transformWithStateInPandas``
    with one event-time timer per open session.

    ``keyed_events``: streaming DataFrame with (user_id, ts) and a
    watermark on ``ts``.  Emits one (user_id, start_us, end_us,
    n_events) row per CLOSED session."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "_SessionWindowTWS",
        (StatefulProcessor,),
        dict(SessionWindowProcessor.__dict__),
    )
    return keyed_events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(gap_ms),
        outputStructType=SESSION_WINDOW_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )


NATIVE_TTL_OUTPUT_SCHEMA = "user_id bigint, n bigint"


class NativeTtlCountProcessor:
    """DECLARATIVE state TTL (the Spark-4 TTLConfig surface): the same
    keyed-store expiry st19's TtlExpiryProcessor hand-rolls with
    event-time timers, delegated to the engine via
    ``getValueState(..., ttlDurationMs=...)`` — every update resets the
    state's expiration to now + ttl, and an expired value simply stops
    existing at the next read.  This completes the TWS surface the
    reference's TTL'd keyed dicts (consumer.py:119-148) map onto:
    ValueState (st18) / ListState (st20) / MapState (st21) / timers
    (st19) / sessions (st23) / declarative TTL (here).

    Per key: a single TTL'd BIGINT running count; each batch reads the
    surviving count (0 if the TTL lapsed), adds the batch's rows, and
    emits the new total.  Native TTL is PROCESSING-time based (the
    API contract: "state update resets the expiration time to current
    processing time plus ttlDuration"), so st24 drives the two
    deterministic regimes instead of racing the clock — see the query
    docstring for how the emitted rows certify expiry."""

    def __init__(self, ttl_ms: int):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._n = handle.getValueState(
            "n", "n BIGINT", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        n = int(self._n.get()[0]) if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._n.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def native_ttl_counts_tws(keyed_events: DataFrame, ttl_ms: int) -> DataFrame:
    """Streaming per-user running counts whose state carries a NATIVE
    (declarative) TTL.  ``keyed_events``: streaming DataFrame with
    (user_id, ...) rows.  Emits one (user_id, n) row per key per batch
    containing the key; ``n`` is the count accumulated since the
    state's last TTL lapse.  timeMode is ProcessingTime because the
    engine rejects TTL'd state under NoTime (TTL is clocked by
    processing time)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "_NativeTtlTWS",
        (StatefulProcessor,),
        dict(NativeTtlCountProcessor.__dict__),
    )
    return keyed_events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(ttl_ms),
        outputStructType=NATIVE_TTL_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
