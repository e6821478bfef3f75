"""Single-video processing pipeline.

The reference's per-video orchestration (pipeline.cpp:89-415) rebuilt for a
host-decode / device-analyze split:

  probe -> chunked parallel host decode (threads over a shared task queue,
  each with its own mmap'd decoder; ctypes releases the GIL) -> per-chunk
  frame features stream through a detector model (batched device kernel)
  -> motion timestamps -> merge (sort+unique) -> gap segmentation with
  padding -> savings decision -> lossless cut (direct or via CutQueue).

Two detector paths share the structure:
  * MV   — codec motion vectors scattered to vote grids host-side, cluster
           kernel on device (default; the reference's only path).
  * SAD  — decoded luma, per-block sum-of-absolute-differences kernel
           (fallback for intra-only/MV-less streams; the reference finds
           nothing on those, motion_scanner.cpp:219-221).
MVT_PIPELINE=auto runs MV first and falls back to SAD when not a single
decoded frame carried MV side data.

The reference's worker threads each ran decode AND analysis; here workers
only decode (host-bound), and analysis is a device dispatch — the
task-queue load balancing survives, the scalar hot loop does not.
Phase accounting mirrors the reference's timing tree
(pipeline.cpp:274-292).
"""

from __future__ import annotations

import dataclasses
import math
import os
import queue
import threading
import time

import numpy as np

from ..core import oracle
from ..core.config import Config
from ..core.types import ScanTask
from ..cut.executor import CutJob, CutQueue, execute_cut
from ..io import native
from ..models.mv_detector import MVClusterDetector
from ..models.sad_detector import SADDetector
from ..utils import logging as log
from ..utils import system
from ..utils.logging import format_time
from ..utils.timing import TimingCollector, timer


@dataclasses.dataclass
class ScanResult:
    motion_ts: list[float]
    frames_scanned: int
    frames_with_mvs: int
    chunks: int


class ProcessingPipeline:
    """Process one video: scan for motion, cut out the static parts.

    When ``cut_queue`` is provided (batch mode) the cut job is pushed for
    deferred execution instead of running inline (pipeline.cpp:358-404);
    ``stream_id >= 0`` prefixes log lines.
    """

    def __init__(self, input_path: str, output_path: str,
                 stream_id: int = -1, num_threads: int = 0,
                 cfg: Config | None = None,
                 cut_queue: CutQueue | None = None,
                 device=None):
        self.input_path = input_path
        self.output_path = output_path
        self.stream_id = stream_id
        self.num_threads = num_threads
        self.cfg = cfg or Config.from_env()
        self.cut_queue = cut_queue
        self.device = device  # pin this stream's analysis to one chip
        self.duration = 0.0
        self.time_removed = 0.0
        self.saved_pct = 0.0

    # --- main entry ---

    def run(self) -> int:
        sid = self.stream_id
        t_total = time.perf_counter_ns()

        log.phase("Mapping + probing...", sid)
        try:
            with timer("probe"):
                probe = native.VideoReader(self.input_path)
                self.duration = probe.duration
                fps = probe.fps
                width, height = probe.width, probe.height
                probe.close()
        except OSError as e:
            log.error(f"Failed to open {self.input_path}: {e}", sid)
            return 1

        log.info(
            f"Duration: {format_time(self.duration)} "
            f"({self.duration * fps:.0f} frames @ {fps:.1f}fps)", sid)

        mode = self.cfg.pipeline_mode
        if mode not in ("mv", "sad", "auto"):
            # a typo ("SAD", "sda") would otherwise silently select the MV
            # scan WITHOUT the auto-SAD fallback — the opposite of what the
            # operator configured (same guard as MVT_SCAN_INPUT below)
            log.warn(f"Unknown MVT_PIPELINE={mode!r}; using auto", sid)
            mode = "auto"
        if self.cfg.compile_cache_dir:
            # env-var plumbing in mvtrim_tpu/__init__ covers processes
            # that import the package; this covers programmatic callers
            # that built a Config with an explicit dir after jax init
            from ..utils.system import enable_compile_cache

            enable_compile_cache(self.cfg.compile_cache_dir)
        profiler_cm = None
        if self.cfg.profile_dir:
            # device-level tracing (the rebuild's analog of the reference's
            # TIMER_* phase accounting, viewable in TensorBoard/XProf)
            import jax.profiler

            profiler_cm = jax.profiler.trace(self.cfg.profile_dir)
            try:
                profiler_cm.__enter__()
            except Exception as e:  # noqa: BLE001
                # the jax profiler is process-global: in batch mode only
                # one stream can hold the trace — others proceed
                # unprofiled instead of failing their video
                log.warn(f"profiler trace unavailable ({e}); "
                         "continuing unprofiled", sid)
                profiler_cm = None
        try:
            if mode == "sad":
                result = self._parallel_scan("sad", fps, width, height)
            else:
                result = self._parallel_scan("mv", fps, width, height)
                if (mode == "auto" and not result.motion_ts
                        and result.frames_scanned > 0
                        and result.frames_with_mvs == 0):
                    log.warn("No MV side data in any frame — "
                             "falling back to pixel-domain SAD scan", sid)
                    result = self._parallel_scan("sad", fps, width, height)
        except RuntimeError as e:
            log.error(f"Scan failed: {e}", sid)
            return 1
        finally:
            if profiler_cm is not None:
                profiler_cm.__exit__(None, None, None)

        log.info(f"Processed {result.chunks} chunks, scanned "
                 f"{result.frames_scanned} frames, found "
                 f"{len(result.motion_ts)} motion frames", sid)

        # --- merge + dedupe (pipeline.cpp:302-304) ---
        log.phase("Merging...", sid)
        with timer("merge"):
            timestamps = oracle.merge_timestamps(result.motion_ts)

        if timestamps.size == 0:
            log.warn("No motion found.", sid)
            TimingCollector.record(
                "total_run", (time.perf_counter_ns() - t_total) // 1000)
            if sid < 0:
                TimingCollector.print_summary()
            self._emit_metrics(result, 0, None, t_total)
            return 0

        # --- segmentation (pipeline.cpp:321-356) ---
        with timer("segmentation"):
            segments = oracle.segments_from_timestamps(
                timestamps, max_gap_sec=self.cfg.max_gap_sec,
                padding_sec=self.cfg.padding_sec, duration=self.duration)

        self.time_removed, self.saved_pct = oracle.savings(
            segments, self.duration)

        # --- cut-vs-copy decision (pipeline.cpp:358-404) ---
        is_cut, out_segments = oracle.decide_cut(
            segments, self.duration, self.cfg.min_savings_pct)
        if not is_cut:
            log.warn(
                f"Savings too low ({int(self.saved_pct)}%). Min required: "
                f"{int(self.cfg.min_savings_pct)}%. Copying full stream.",
                sid)

        if self.cut_queue is not None:
            self.cut_queue.push(CutJob(
                stream_id=sid,
                input_path=os.path.abspath(self.input_path),
                output_path=self.output_path,
                segments=out_segments))
            log.info("Pushed cut job to queue", sid)
        else:
            log.phase("Cutting...", sid)
            with timer("execute_cut"):
                execute_cut(self.input_path, self.output_path, out_segments,
                            sid, self.cfg)

        TimingCollector.record(
            "total_run", (time.perf_counter_ns() - t_total) // 1000)
        if sid < 0:
            TimingCollector.print_summary()
        self.print_cut_summary()
        self._emit_metrics(result, int(timestamps.size), is_cut, t_total)
        return 0

    def _emit_metrics(self, result: ScanResult, motion_frames: int,
                      is_cut: bool | None, t_total: int) -> None:
        """Structured per-video metrics (MVT_METRICS_JSON, append-only
        JSON lines) — the metrics export the reference lacks."""
        if not self.cfg.metrics_json:
            return
        import json

        phases: dict[str, int] = {}
        for name, us in TimingCollector.entries():
            phases[name] = phases.get(name, 0) + us
        rec = {
            "input": self.input_path,
            "output": self.output_path,
            "stream_id": self.stream_id,
            "duration_sec": self.duration,
            "frames_scanned": result.frames_scanned,
            "frames_with_mvs": result.frames_with_mvs,
            "motion_frames": motion_frames,
            "time_removed_sec": self.time_removed,
            "saved_pct": self.saved_pct,
            "decision": ("cut" if is_cut else
                         "copy" if is_cut is not None else "no_motion"),
            "wall_sec": (time.perf_counter_ns() - t_total) / 1e9,
            # sum duplicates: the auto mv->sad fallback records each scan
            # phase twice (a plain dict() would keep only the last)
            "phases_us": phases,
        }
        try:
            with open(self.cfg.metrics_json, "a") as f:
                f.write(json.dumps(rec) + "\n")
        except OSError as e:
            log.warn(f"metrics export failed: {e}", self.stream_id)

    # --- scan phase (pipeline.cpp:127-295) ---

    def _scan_thread_count(self, num_chunks: int) -> int:
        """Thread count rules (pipeline.cpp:129-143): explicit per-stream
        count in batch mode, else max(2, cgroup-aware cpu limit), always
        capped by the chunk count."""
        if self.num_threads > 0:
            n = self.num_threads
        else:
            n = max(2, system.detect_cpu_limit())
        if self.cfg.decode_workers > 0:
            n = self.cfg.decode_workers
        return max(1, min(n, num_chunks))

    def _parallel_scan(self, kind: str, fps: float, width: int,
                       height: int) -> ScanResult:
        """Chunked parallel decode + batched device analysis.

        kind: 'mv' (vote grids -> cluster kernel) or 'sad' (luma -> block
        SAD kernel).
        """
        sid = self.stream_id
        cfg = self.cfg
        if kind == "mv":
            detector = MVClusterDetector(width, height, cfg,
                                         device=self.device)
        else:
            detector = SADDetector(width, height, cfg, device=self.device)
        geom = detector.geom
        frame_skip = cfg.frame_skip(fps)

        # H2D payload for the MV path (MVT_SCAN_INPUT):
        #   bits   — host-thresholded activity masks, bit-packed (default;
        #            8x less transfer than grids, identical decision)
        #   words  — the same masks emitted natively in the device
        #            kernel's int32 word layout: the per-batch repack
        #            leaves the Python feeder for the GIL-released decode
        #            workers (the many-core scaling path; 1.5x the bits
        #            payload on the wire)
        #   grids  — uint8 vote grids (full counts; required by MVT_HEATMAP
        #            only for historical reasons — bits carries it too)
        #   mv_raw — raw MV fields, thresholding+scatter on device (for
        #            hosts where the scatter CPU is the constraint)
        scan_input = cfg.scan_input if kind == "mv" else "luma"
        if kind == "mv" and scan_input not in ("bits", "words", "grids",
                                               "mv_raw"):
            log.warn(f"Unknown MVT_SCAN_INPUT={scan_input!r}; using bits",
                     sid)
            scan_input = "bits"
        if kind == "mv" and scan_input == "grids" and \
                cfg.vectors_needed == 0:
            # raw vote grids cannot distinguish "no MV side data"
            # (reference decides False unconditionally,
            # motion_scanner.cpp:219-221) from "side data but every MV
            # filtered" (True at vec_need 0 — zero votes satisfy >= 0);
            # the packed masks carry the distinction natively and are
            # decision-identical in every other respect
            log.info("VECTORS_NEEDED=0: vote grids are ambiguous for "
                     "MV-less frames; using the bits payload "
                     "(identical decisions)", sid)
            scan_input = "bits"
        if scan_input == "mv_raw" and cfg.heatmap_path:
            log.warn("MVT_HEATMAP is unavailable with MVT_SCAN_INPUT="
                     "mv_raw (no per-cell grids on host); skipping heatmap",
                     sid)

        num_chunks = max(1, math.ceil(self.duration /
                                      cfg.chunk_duration_sec))
        n_threads = self._scan_thread_count(num_chunks)
        # luma chunks are large (H*W bytes/frame); cap frames per scan call
        if cfg.chunk_frames_cap > 0:
            chunk_frames_cap = cfg.chunk_frames_cap
        elif kind == "sad":
            chunk_frames_cap = max(
                16, (512 * 1024 * 1024) // max(1, width * height)
                // max(1, n_threads))
        else:
            chunk_frames_cap = 1 << 30

        log.phase(
            f"Parallel {'SAD ' if kind == 'sad' else ''}Scan "
            f"({n_threads} threads, {cfg.chunk_duration_sec:.0f}s chunks)...",
            sid)

        t_scan = time.perf_counter_ns()

        # analyzed-frame cap per native scan call — shared by the workers
        # and the warm-up bucket estimate below
        max_frames = min(
            chunk_frames_cap,
            int(math.ceil(cfg.chunk_duration_sec * max(fps, 1.0))) + 64)

        # Warm the device program BEFORE spawning decode threads: tracing +
        # compilation are host-CPU-heavy and would otherwise contend with
        # the decoders (painful on small hosts / remote-compile setups).
        warm_t0 = time.perf_counter_ns()
        if kind != "mv":
            detector.scan_luma(np.zeros((2, height, width), np.uint8))
        elif scan_input == "bits":
            detector.scan_bits(
                np.zeros((1, geom.gh, (geom.gw + 7) // 8), np.uint8))
        elif scan_input == "words":
            # single source of truth for the word layout the kernel wants
            from ..ops.cluster import word_geometry

            detector.scan_words(
                np.zeros((1, word_geometry(geom)[1]), np.int32))
        elif scan_input == "mv_raw":
            # warm both dispatch buckets frames will land in: the small
            # one (tail chunks) and the one a typical chunk pads to —
            # raw-MV dispatches bucket to powers of two (scan_raw_mvs),
            # and compiling mid-decode would stall the feeder
            detector.scan_raw_mvs(
                np.zeros((1, cfg.mv_capacity, 4), np.int16),
                np.zeros((1,), np.int32))
            # estimate the typical sub-scan length the way the workers
            # produce it: a chunk's analyzed frames are decoded/skip
            # (TARGET_FPS), capped at max_frames per call — ignoring
            # either would land real dispatches in an unwarmed
            # power-of-two bucket and compile mid-decode
            expect = min(
                max_frames,
                int(math.ceil(math.ceil(
                    cfg.chunk_duration_sec * max(fps, 1.0))
                    / max(1, frame_skip))) + 64)
            n_warm = min(detector.device_batch, max(256, expect))
            if n_warm > 256:
                detector.scan_raw_mvs(
                    np.zeros((n_warm, cfg.mv_capacity, 4), np.int16),
                    np.zeros((n_warm,), np.int32))
        else:
            detector.scan_votes(np.zeros((1, geom.gh, geom.gw), np.uint8))
        warmup_us = (time.perf_counter_ns() - warm_t0) // 1000

        setup_t0 = time.perf_counter_ns()

        tasks: queue.Queue[ScanTask | None] = queue.Queue()
        chunk_id = 0
        t = 0.0
        while t < self.duration:
            end = min(t + cfg.chunk_duration_sec, self.duration)
            tasks.put(ScanTask(t, end, chunk_id))
            chunk_id += 1
            t += cfg.chunk_duration_sec
        for _ in range(n_threads):
            tasks.put(None)
        log.info(f"Created {chunk_id} chunks", sid)
        setup_us = (time.perf_counter_ns() - setup_t0) // 1000

        # bounded stream of decoded chunks keeps host memory flat
        results: queue.Queue = queue.Queue(maxsize=max(4, 2 * n_threads))
        init_us = [0] * n_threads
        timings = [native.ScanTiming() for _ in range(n_threads)]
        errors: list[Exception] = []

        reader_mode = native.MVT_MODE_MV if kind == "mv" \
            else native.MVT_MODE_LUMA

        def worker(widx: int) -> None:
            try:
                t0 = time.perf_counter_ns()
                reader = native.VideoReader(self.input_path, reader_mode)
                init_us[widx] = (time.perf_counter_ns() - t0) // 1000
                while True:
                    task = tasks.get()
                    if task is None:
                        break
                    # resume when the frame cap saturates (VFR bursts can
                    # exceed the probed-fps estimate; silently dropping the
                    # chunk tail would lose motion); the luma path also
                    # sub-chunks when its memory cap binds.  resume=True
                    # continues the decode from the exact stream position
                    # with the frame-skip counter carried on the handle,
                    # so a capped chunk analyzes the identical frame set
                    # as the reference's uncapped single-counter scan
                    # (motion_scanner.cpp:314,356-357) — including with
                    # TARGET_FPS phase active.
                    resume = False
                    cap = cfg.mv_capacity
                    emitted = 0       # frames queued from this chunk
                    skip_dup = 0      # duplicates to drop after restart
                    mv_base = timings[widx].frames_with_mvs
                    luma_carry = None  # last analyzed frame of prior sub-scan
                    while True:
                        raw_n = -1
                        if scan_input == "bits":
                            data, pts = reader.scan_bits(
                                task.start, task.end,
                                threshold_sq=cfg.mv_threshold_sq,
                                block_shift=cfg.block_shift,
                                gw=geom.gw, gh=geom.gh,
                                y_min=geom.y_min, y_max=geom.y_max,
                                vectors_needed=cfg.vectors_needed,
                                frame_skip=frame_skip,
                                max_frames=max_frames,
                                timing=timings[widx], resume=resume)
                            item = ("bits", data, pts)
                        elif scan_input == "words":
                            data, pts = reader.scan_words(
                                task.start, task.end,
                                threshold_sq=cfg.mv_threshold_sq,
                                block_shift=cfg.block_shift,
                                gw=geom.gw, gh=geom.gh,
                                y_min=geom.y_min, y_max=geom.y_max,
                                vectors_needed=cfg.vectors_needed,
                                frame_skip=frame_skip,
                                max_frames=max_frames,
                                timing=timings[widx], resume=resume)
                            item = ("words", data, pts)
                        elif scan_input == "grids":
                            data, pts = reader.scan_grids(
                                task.start, task.end,
                                threshold_sq=cfg.mv_threshold_sq,
                                block_shift=cfg.block_shift,
                                gw=geom.gw, gh=geom.gh,
                                y_min=geom.y_min, y_max=geom.y_max,
                                frame_skip=frame_skip,
                                max_frames=max_frames,
                                timing=timings[widx], resume=resume)
                            item = ("grids", data, pts)
                        elif scan_input == "mv_raw":
                            mvs, counts, pts = reader.scan_mvs(
                                task.start, task.end,
                                frame_skip=frame_skip,
                                max_frames=max_frames, max_mv=cap,
                                timing=timings[widx], resume=resume)
                            raw_n = len(pts)
                            if raw_n and (counts < 0).any():
                                # capacity overflow: restart the WHOLE
                                # chunk from a fresh seek with a capacity
                                # that fits every frame, so the decision
                                # is over the COMPLETE MV list — exact,
                                # and no device recompile for a rare path
                                # (the feeder decides oversized frames on
                                # the host oracle).  Decode is
                                # deterministic, so the restart replays
                                # frames already queued from this chunk
                                # identically: drop those duplicates
                                # before emitting (stats stay exact, no
                                # duplicate dispatch) and rewind the
                                # native frames_with_mvs counter so the
                                # re-decode counts each frame once.
                                cap = 1 << int(np.ceil(np.log2(
                                    -counts.min())))
                                resume = False
                                skip_dup = emitted
                                timings[widx].frames_with_mvs = mv_base
                                continue
                            if skip_dup:
                                k = min(skip_dup, raw_n)
                                mvs, counts, pts = \
                                    mvs[k:], counts[k:], pts[k:]
                                skip_dup -= k
                            tag = "mv" if cap == cfg.mv_capacity \
                                else "mv_host"
                            item = (tag, (mvs, counts), pts)
                        else:
                            data, pts = reader.scan_luma(
                                task.start, task.end,
                                frame_skip=frame_skip,
                                max_frames=max_frames,
                                timing=timings[widx], resume=resume)
                            # thread the boundary frame across cap-resumed
                            # sub-scans so the first frame of a resumed
                            # sub-scan is compared to its REAL predecessor
                            # (SADDetector would otherwise decide it False
                            # — the cap must never change decisions)
                            item = ("luma", (data, luma_carry), pts)
                            if len(data):
                                luma_carry = data[-1].copy()
                        if raw_n < 0:
                            raw_n = len(pts)
                        if raw_n == 0:
                            break
                        if len(pts):       # can be empty post-dedup
                            emitted += len(pts)
                            results.put(item)
                        if raw_n < max_frames:
                            break
                        resume = True
                reader.close()
            except Exception as e:  # noqa: BLE001 — surfaced after join
                errors.append(e)
            finally:
                results.put(None)  # worker-done sentinel

        workers_t0 = time.perf_counter_ns()
        threads = [threading.Thread(target=worker, args=(i,),
                                    name=f"decode-{i}")
                   for i in range(n_threads)]
        for th in threads:
            th.start()

        # device feeder: consume chunks, dispatch asynchronously, resolve
        # at the end so H2D+compute overlap decode.  Keep draining even
        # after a detector failure: decode workers block on the bounded
        # queue otherwise and the process never exits.
        device_us = 0
        pending: list[tuple[np.ndarray, object]] = []
        frames_scanned = 0
        done_workers = 0
        # optional spatial analytics riding the already-decoded grids
        heat_acc = (np.zeros((geom.gh, geom.gw), np.int64)
                    if (cfg.heatmap_path and kind == "mv"
                        and scan_input != "mv_raw") else None)
        while done_workers < n_threads:
            item = results.get()
            if item is None:
                done_workers += 1
                continue
            if errors:
                continue  # drain only; a failure is already recorded
            tag, data, pts = item
            t0 = time.perf_counter_ns()
            try:
                if tag == "bits":
                    resolver = detector.scan_bits_async(data)
                elif tag == "words":
                    resolver = detector.scan_words_async(data)
                elif tag == "grids":
                    resolver = detector.scan_votes_async(data)
                elif tag == "mv":
                    resolver = detector.scan_raw_mvs_async(*data)
                elif tag == "mv_host":
                    # overflow re-scan: decide on the host oracle over the
                    # complete (re-decoded) MV lists — bit-exact, rare
                    mvs, counts = data
                    motion = np.array([
                        oracle.check_frame(
                            mvs[i, :counts[i]].astype(np.int64),
                            geom.gw, geom.gh,
                            threshold_sq=cfg.mv_threshold_sq,
                            block_shift=cfg.block_shift,
                            y_min=geom.y_min, y_max=geom.y_max,
                            vectors_needed=cfg.vectors_needed,
                            clusters_needed=cfg.clusters_needed)
                        for i in range(len(pts))], dtype=bool)
                    resolver = (lambda m=motion: m)
                else:
                    luma, carry = data
                    motion = detector.scan_luma(luma, carry=carry)
                    resolver = (lambda m=motion: m)
            except Exception as e:  # noqa: BLE001 — surfaced after drain
                errors.append(e)
                continue
            device_us += (time.perf_counter_ns() - t0) // 1000
            frames_scanned += len(pts)
            if heat_acc is not None:
                if tag in ("bits", "words"):
                    # words is the same little-endian bit layout viewed
                    # as int32 lanes — one byte view, shared accumulation
                    packed = (data if tag == "bits" else
                              data.view(np.uint8).reshape(
                                  len(pts), geom.gh, -1))
                    heat_acc += np.unpackbits(
                        packed, axis=2,
                        bitorder="little")[:, :, :geom.gw].sum(
                            axis=0, dtype=np.int64)
                elif tag == "grids":
                    heat_acc += (data >= cfg.vectors_needed).sum(
                        axis=0, dtype=np.int64)
            pending.append((pts, resolver))

        motion_ts: list[float] = []
        t0 = time.perf_counter_ns()
        try:
            for pts, resolver in pending:
                motion = resolver()
                motion_ts.extend(pts[motion].tolist())
        except Exception as e:  # noqa: BLE001
            errors.append(e)
        device_us += (time.perf_counter_ns() - t0) // 1000

        join_t0 = time.perf_counter_ns()
        for th in threads:
            th.join()
        join_us = (time.perf_counter_ns() - join_t0) // 1000
        workers_us = (time.perf_counter_ns() - workers_t0) // 1000

        if errors:
            raise RuntimeError(errors[0])

        scan_us = (time.perf_counter_ns() - t_scan) // 1000
        TimingCollector.record(f"parallel_scan[{kind}]", scan_us)
        if sid < 0:
            tot = native.ScanTiming()
            for tm in timings:
                tot.seek_us += tm.seek_us
                tot.decode_us += tm.decode_us
                tot.analyze_us += tm.analyze_us
                tot.frames_with_mvs += tm.frames_with_mvs
            TimingCollector.record("  ├─warmup(jit)", warmup_us)
            TimingCollector.record("  ├─setup", setup_us)
            TimingCollector.record("  ├─workers", workers_us)
            TimingCollector.record(f"  │ ├─init ({n_threads}T)",
                                   sum(init_us))
            TimingCollector.record(f"  │ ├─seek ({n_threads}T)", tot.seek_us)
            TimingCollector.record(f"  │ ├─decode ({n_threads}T)",
                                   tot.decode_us)
            TimingCollector.record(f"  │ └─scatter ({n_threads}T)",
                                   tot.analyze_us)
            TimingCollector.record("  ├─device_scan", device_us)
            TimingCollector.record("  └─join", join_us)

        if heat_acc is not None and frames_scanned and not errors:
            self._write_heatmap(heat_acc, frames_scanned, geom)

        frames_with_mvs = sum(tm.frames_with_mvs for tm in timings)
        return ScanResult(motion_ts, frames_scanned, frames_with_mvs,
                          chunk_id)

    def _write_heatmap(self, counts: np.ndarray, frames: int, geom) -> None:
        """Per-video spatial activity JSON (MVT_HEATMAP names a directory
        or a file; directories get <input-basename>.heatmap.json)."""
        import json

        path = self.cfg.heatmap_path
        if os.path.isdir(path):
            base = os.path.basename(self.input_path) + ".heatmap.json"
            path = os.path.join(path, base)
        elif self.stream_id >= 0:
            # batch mode with a FILE target: parallel streams would race
            # open(path, "w") — interleaved/clobbered JSON, and even the
            # clean case silently keeps only the last writer.  Suffix per
            # input like the directory branch does.
            path = f"{path}.{os.path.basename(self.input_path)}.json"
            log.warn("MVT_HEATMAP names a file but batch mode has one "
                     f"heatmap per input; writing {path}", self.stream_id)
        activity = counts / frames
        doc = {
            "input": self.input_path,
            "grid": [geom.gh, geom.gw],
            "frames_analyzed": frames,
            "mean_activity": round(float(activity.mean()), 6),
            "max_activity": round(float(activity.max()), 4),
            "activity": [[round(float(v), 4) for v in row]
                         for row in activity],
        }
        try:
            with open(path, "w") as f:
                json.dump(doc, f)
            log.info(f"Heatmap written to {path}", self.stream_id)
        except OSError as e:
            log.warn(f"heatmap export failed: {e}", self.stream_id)

    # --- cut summary (pipeline.cpp:419-448) ---

    def print_cut_summary(self) -> None:
        log.print_cut_summary(self.duration, self.time_removed,
                              self.saved_pct, self.stream_id)
