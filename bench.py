"""Benchmark: 1080p motion-scan throughput per chip, roofline-audited.

Measures the device scan stage — the replacement for the reference's
check_frame hot loop (motion_scanner.cpp:217-295) — over device-resident
1080p vote grids with the default detector config.  Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", ...audit fields} where
vs_baseline is the ratio to the 50,000 frames/sec/chip north star
(BASELINE.json).

Methodology (designed so the number CANNOT exceed physics):
  * the timed region is ONE dispatch of a fori_loop chain in which every
    iteration's motion decisions feed an int32 accumulator, and the
    accumulator is fetched to the host inside the window — a data
    dependency on every byte of every iteration's input, so neither XLA
    nor an eager-acking transport can skip work;
  * iterations rotate over 8 distinct device buffers larger than any
    on-chip storage, so HBM is re-read every iteration;
  * the accumulator is checked against the NumPy oracle's motion count
    (compute proof), and the implied HBM bandwidth is checked against
    the chip's roofline (physics proof).  A number failing either check
    is re-measured once with 4x iterations and flagged if still invalid.

The kernel is HBM-bandwidth-bound (9216 B/frame of uint8 grid reads at
1080p), so the honest per-chip ceiling on a v5e (~819 GB/s) is ~89M
frames/s — see PERFORMANCE.md.  The bit-packed product path (1020
B/frame) is reported as a secondary with its own roofline.
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np


def _load_bench_module(name):
    """Import a benchmarks/*.py harness (not a package) by path, so
    bench.py can reuse the audited single-launch variant builders."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

# chip HBM rooflines, GB/s (approximate public figures; override with
# MVT_HBM_GBPS when benching other hardware)
HBM_GBPS = {
    "TPU v5 lite": 819.0,   # v5e
    "TPU v4": 1228.0,
    "TPU v5": 2765.0,       # v5p
    "TPU v6 lite": 1640.0,  # v6e / Trillium
}


def _roofline_gbps(dev) -> float:
    import os
    env = os.environ.get("MVT_HBM_GBPS")
    if env:
        return float(env)
    kind = getattr(dev, "device_kind", "")
    for k, v in HBM_GBPS.items():
        if kind.startswith(k):
            return v
    return 819.0


def _chained_bench(op, stacked, iters):
    """Time `iters` chained invocations of op over rotating buffers.

    Returns (seconds_per_iter, device_motion_total).  The returned total
    is the host-fetched accumulator — fetching it synchronizes on every
    iteration in the chain.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    k = stacked.shape[0]

    @jax.jit
    def chain(stacked, acc, n):
        def body(i, acc):
            _, motion = op(stacked[i % k])
            return acc + jnp.sum(motion.astype(jnp.int32))
        return lax.fori_loop(0, n, body, acc)

    # warmup: compile + one full run
    int(chain(stacked, jnp.int32(0), iters))
    t0 = time.perf_counter()
    total = int(chain(stacked, jnp.int32(0), iters))
    dt = time.perf_counter() - t0
    return dt / iters, total


def _sweep_bench(geom, cfg, stacked, iters, block_b=128):
    """Speed-of-light variant: ONE pallas launch whose grid spans all
    `iters` passes, index-mapped to rotate over the K resident buffers.

    No per-iteration dispatch, no dynamic-slice copies — each grid step
    streams its block HBM->VMEM, runs the product cluster math
    (ops.cluster._cluster_map), and writes one int32 per frame.  The
    final reduction + host fetch of the counts keeps the data dependency
    on every block.  Returns (seconds_per_iter, device_motion_total).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mvtrim_tpu.ops.cluster import cluster_map_kernel

    k, b, ghp, gwp = stacked.shape
    if b % block_b:
        # a non-divisor block would leave grid blocks unvisited and
        # garbage in the output — the checksum would flag a CORRECT
        # kernel; shrink to a divisor so the bench is valid by
        # construction (same rule as _sweep_bench_packed)
        block_b = next(d for d in range(min(block_b, b), 0, -1)
                       if b % d == 0)
    nb = b // block_b
    assert nb * block_b == b, (b, block_b)

    clusters_needed = max(1, cfg.clusters_needed)

    # Matmul-style accumulation: the frame-block axis is outer, the pass
    # axis inner, so each output block [block_b, 1] stays VMEM-resident
    # while the input streams HBM->VMEM once per pass.  Every pass's
    # motion decisions land in the accumulator, so the host-side checksum
    # covers ALL iterations (no pass can be skipped without detection).
    def kernel(votes_ref, acc_ref):
        it = pl.program_id(1)
        v = votes_ref[0].astype(jnp.int32)          # [block_b, GH, GW]
        cl = cluster_map_kernel(v, geom, cfg.vectors_needed).astype(
            jnp.int32)
        row_sums = jnp.sum(cl, axis=2)               # [block_b, GH]
        counts = jnp.sum(row_sums, axis=1, keepdims=True)  # [block_b, 1]
        motion = (counts >= clusters_needed).astype(jnp.int32)

        @pl.when(it == 0)
        def _init():
            acc_ref[:] = motion

        @pl.when(it != 0)
        def _acc():
            acc_ref[:] = acc_ref[:] + motion

    sweep = pl.pallas_call(
        kernel,
        grid=(nb, iters),
        in_specs=[pl.BlockSpec((1, block_b, ghp, gwp),
                               lambda jb, it: (it % k, jb, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_b, 1), lambda jb, it: (jb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
    )

    @jax.jit
    def run(stacked):
        return jnp.sum(sweep(stacked))

    int(run(stacked))  # warmup: compile + one full pass
    t0 = time.perf_counter()
    total = int(run(stacked))
    dt = time.perf_counter() - t0
    return dt / iters, total


def _sweep_bench_packed(geom, cfg, stacked_bits, iters, block_b=None,
                        domain="words"):
    """Speed-of-light measurement of the packed-domain cluster kernels
    (the MVT_SCAN_INPUT=bits product path): same single-launch resident-
    accumulator harness as _sweep_bench, with the packed masks passed as
    kernel inputs.  domain='words' = int32 lanes of 32 cells (the
    detector's kernel); 'bytes' = uint8 lanes of 8 cells (the
    transfer-optimal archive variant)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mvtrim_tpu.ops.cluster import (_packed_masks, _word_masks,
                                        packed_cluster_counts,
                                        packed_geometry, word_geometry,
                                        word_cluster_counts)

    k, b, lanes = stacked_bits.shape
    if block_b is None:
        # largest multiple-of-8 divisor of b whose int32 working set
        # (~2MB) fits VMEM — a non-divisor block would leave grid blocks
        # unvisited and garbage in the output (the checksum catches it,
        # but the bench must be valid by construction)
        assert b % 8 == 0, b  # guarantees the divisor search terminates
        cap = max(8, min(1024, (2 << 20) // (lanes * 4) & ~7, b))
        block_b = next(d for d in range(cap, 7, -8) if b % d == 0)
    nb = b // block_b
    assert nb * block_b == b, (b, block_b)
    clusters_needed = max(1, cfg.clusters_needed)
    if domain == "words":
        masks_np = tuple(m[None, :] for m in _word_masks(geom))
        counts_fn = word_cluster_counts
        assert lanes == word_geometry(geom)[2], (lanes, geom)
        assert stacked_bits.dtype == jnp.int32
    else:
        masks_np = tuple(m[None, :] for m in _packed_masks(geom))
        counts_fn = packed_cluster_counts
        assert lanes == packed_geometry(geom)[2], (lanes, geom)

    def kernel(bits_ref, center_ref, nf_ref, nl_ref, acc_ref):
        it = pl.program_id(1)
        a = bits_ref[0]
        if a.dtype != jnp.int32:
            a = a.astype(jnp.int32)                  # [block_b, lanes]
        masks = (center_ref[:], nf_ref[:], nl_ref[:])
        counts = counts_fn(
            a, geom, masks, lambda v, s: pltpu.roll(v, s, 1))
        motion = (counts >= clusters_needed).astype(jnp.int32)

        @pl.when(it == 0)
        def _init():
            acc_ref[:] = motion

        @pl.when(it != 0)
        def _acc():
            acc_ref[:] = acc_ref[:] + motion

    mask_spec = pl.BlockSpec((1, lanes), lambda jb, it: (0, 0),
                             memory_space=pltpu.VMEM)
    sweep = pl.pallas_call(
        kernel,
        grid=(nb, iters),
        in_specs=[pl.BlockSpec((1, block_b, lanes),
                               lambda jb, it: (it % k, jb, 0),
                               memory_space=pltpu.VMEM),
                  mask_spec, mask_spec, mask_spec],
        out_specs=pl.BlockSpec((block_b, 1), lambda jb, it: (jb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
    )

    @jax.jit
    def run(stacked_bits):
        masks = tuple(jnp.asarray(m) for m in masks_np)
        return jnp.sum(sweep(stacked_bits, *masks))

    int(run(stacked_bits))  # warmup: compile + one full pass
    t0 = time.perf_counter()
    total = int(run(stacked_bits))
    dt = time.perf_counter() - t0
    return dt / iters, total


def _sweep_bench_words_T(geom, cfg, stacked_T, iters, block_b=1024):
    """Transposed word-domain sweep (ops/cluster.word_cluster_counts_T):
    words on sublanes, frames on lanes, popcount reduction on the MXU —
    the fastest kernel measured (benchmarks/word_bench.py).  Same
    single-launch resident-accumulator methodology; stacked_T is
    [K, lanes, B] int32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mvtrim_tpu.ops.cluster import (_word_masks, word_cluster_counts_T,
                                        word_geometry)

    k, lanes, b = stacked_T.shape
    gww, used, lanes_w = word_geometry(geom)
    assert lanes == lanes_w, (stacked_T.shape, geom)
    # block_b is the LANE dim: multiple of 128 (tile alignment) or the
    # whole batch — a misaligned divisor fails Mosaic lowering
    cap = min(block_b, b)
    block_b = next((d for d in range(cap - cap % 128, 127, -128)
                    if b % d == 0), b)
    nb = b // block_b
    clusters_needed = max(1, cfg.clusters_needed)
    masks_full = tuple(m[:, None] for m in _word_masks(geom))
    # same selection as the product op builder: edge masks are redundant
    # when the up/down wrap can only source the zero-padded lanes
    slim = lanes - used >= gww
    masks_np = masks_full[:1] if slim else masks_full

    def kernel(words_ref, *refs):
        mask_refs, (acc_ref,) = refs[:-1], refs[-1:]
        it = pl.program_id(1)
        masks = (mask_refs[0][:],
                 mask_refs[1][:] if not slim else None,
                 mask_refs[2][:] if not slim else None)
        counts = word_cluster_counts_T(
            words_ref[0], geom, masks, lambda v, s: pltpu.roll(v, s, 0))
        motion = (counts >= clusters_needed).astype(jnp.int32)

        @pl.when(it == 0)
        def _init():
            acc_ref[:] = motion

        @pl.when(it != 0)
        def _acc():
            acc_ref[:] = acc_ref[:] + motion

    mask_spec = pl.BlockSpec((lanes, 1), lambda jb, it: (0, 0),
                             memory_space=pltpu.VMEM)
    sweep = pl.pallas_call(
        kernel,
        grid=(nb, iters),
        in_specs=[pl.BlockSpec((1, lanes, block_b),
                               lambda jb, it: (it % k, 0, jb),
                               memory_space=pltpu.VMEM)] +
                 [mask_spec] * len(masks_np),
        out_specs=pl.BlockSpec((1, block_b), lambda jb, it: (0, jb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.int32),
    )
    masks_dev = tuple(jnp.asarray(m) for m in masks_np)

    @jax.jit
    def run(stacked_T):
        return jnp.sum(sweep(stacked_T, *masks_dev))

    int(run(stacked_T))  # warmup: compile + one full pass
    t0 = time.perf_counter()
    total = int(run(stacked_T))
    dt = time.perf_counter() - t0
    return dt / iters, total


def build_control_sweep_T(k, lanes, b, block_b, iters):
    """Stream-bound control kernel for the transposed word layout
    (VERDICT r2 directive 1), shared with benchmarks/word_bench.py's
    ``tctrl`` variant so the control methodology lives in ONE place:
    IDENTICAL launch structure to _sweep_bench_words_T — same grid
    (nb, iters), same [1, lanes, block_b] input blocks rotating over the
    K resident buffers, same [1, b] VMEM-resident accumulator — but the
    math is the cheapest full-data-dependency reduce expressible (bit-0
    mask + MXU ones-matmul).  Its achieved GB/s is the practical HBM
    ceiling of this exact pallas/grid configuration on this chip; the
    product kernel is judged as a fraction of THIS, not only of the
    paper roofline.

    The returned (unjitted) pallas call yields the [1, b] per-frame
    accumulator; entries stay < 2^31 (<= lanes * iters) but the
    cross-frame total must be summed host-side in int64.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = b // block_b
    assert nb * block_b == b, (b, block_b)

    def kernel(words_ref, acc_ref):
        it = pl.program_id(1)
        wT = words_ref[0]                              # [lanes, block_b]
        ones = jnp.ones((1, lanes), jnp.float32)
        counts = jax.lax.dot_general(
            ones, (wT & 1).astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)

        @pl.when(it == 0)
        def _init():
            acc_ref[:] = counts

        @pl.when(it != 0)
        def _acc():
            acc_ref[:] = acc_ref[:] + counts

    return pl.pallas_call(
        kernel,
        grid=(nb, iters),
        in_specs=[pl.BlockSpec((1, lanes, block_b),
                               lambda jb, it: (it % k, 0, jb),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_b), lambda jb, it: (0, jb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.int32),
    )


def _sweep_control_T(stacked_T, iters, block_b=1024):
    """Time the stream-bound control (see build_control_sweep_T).

    Returns (seconds_per_iter, host_total); host_total must equal the
    rotation-weighted sum of per-buffer odd-word counts (the bit-0 mask
    keeps a load dependency on every word while staying int32-exact).
    """
    import jax

    k, lanes, b = stacked_T.shape
    cap = min(block_b, b)
    block_b = next((d for d in range(cap - cap % 128, 127, -128)
                    if b % d == 0), b)
    run = jax.jit(build_control_sweep_T(k, lanes, b, block_b, iters))
    # the per-frame accumulator entries stay < 2^31 (<= lanes * iters);
    # the cross-frame sum would not, so fetch and sum on host in int64
    np.asarray(run(stacked_T))  # warmup: compile + one full pass
    t0 = time.perf_counter()
    acc = np.asarray(run(stacked_T))
    dt = time.perf_counter() - t0
    return dt / iters, int(acc.sum(dtype=np.int64))


def _expected_total(motion_per_buf, k, iters):
    full, rem = divmod(iters, k)
    return int(sum(int(m) * (full + (1 if i < rem else 0))
                   for i, m in enumerate(motion_per_buf)))


def _audit(name, fps, bytes_per_frame, roofline_gbps, checksum_ok):
    implied = fps * bytes_per_frame / 1e9
    pct = 100.0 * implied / roofline_gbps
    ok = checksum_ok and implied <= roofline_gbps * 1.05
    print(f"{name}: {fps:,.0f} frames/s | implied {implied:,.1f} GB/s "
          f"({pct:.0f}% of {roofline_gbps:.0f} GB/s roofline) | "
          f"checksum {'ok' if checksum_ok else 'MISMATCH'}"
          f"{'' if ok else ' | INVALID'}", file=sys.stderr)
    return ok, implied, pct


def _mv_secondary(geom, cfg, roofline):
    """Audited honest-window fused raw-MV number for the headline JSON.

    The retired secondary timed 20 whole-op dispatches through the
    tunnel — a dispatch-path bound (~28ms fixed cost each) that
    understated the kernel ~7x and needed an external pointer to
    benchmarks/mv_bench.py.  This runs the mv_bench single-launch
    methodology inline: one pallas launch spanning all passes over
    rotating resident buffers, per-frame cluster counts written to HBM,
    host-fetched and diffed frame-by-frame against the shared oracle
    restatement (ops/mv_vote.host_expected_clusters).
    """
    import jax

    from mvtrim_tpu.ops import mv_vote

    mv_bench = _load_bench_module("mv_bench")
    k, b, m, f_step = 4, 1024, 2048, 16  # f_step = frames per grid step
    iters = int(os.environ.get("MVT_BENCH_MV_ITERS", 4096))
    rng = np.random.default_rng(7)
    dst_x = rng.integers(-32, 1952, size=(k, b, m)).astype(np.int32)
    dst_y = rng.integers(-32, 1112, size=(k, b, m)).astype(np.int32)
    src_x = (dst_x - rng.integers(-8, 9, size=(k, b, m))).astype(np.int32)
    src_y = (dst_y - rng.integers(-8, 9, size=(k, b, m))).astype(np.int32)
    counts = rng.integers(0, m + 1, size=(k, b)).astype(np.int32)

    run = mv_bench.build_variant("prod", geom, cfg, k=k, b=b, m=m,
                                 iters=iters, fps=f_step)
    flat3 = lambda a: jax.device_put(
        np.ascontiguousarray(a.reshape(k * b, 1, m)))
    d_args = (flat3(dst_x), flat3(dst_y), flat3(src_x), flat3(src_y),
              None, jax.device_put(counts.reshape(k * b)))
    np.asarray(run(*d_args))               # compile + one full pass
    t0 = time.perf_counter()
    out = np.asarray(run(*d_args))
    dt = time.perf_counter() - t0

    last = (iters - 1) % k
    _, expected = mv_vote.host_expected_clusters(
        dst_x[last], dst_y[last], src_x[last], src_y[last], counts[last],
        geom, threshold_sq=cfg.mv_threshold_sq,
        block_shift=cfg.block_shift, vectors_needed=cfg.vectors_needed)
    ok = np.array_equal(out.astype(np.int64), expected)
    fps_meas = b * iters / dt
    bpf = 4 * m * 4
    valid, implied, pct = _audit("fused MV (single-launch)", fps_meas,
                                 bpf, roofline, ok)
    rec = {"frames_per_sec": round(fps_meas),
           "implied_hbm_gbps": round(implied, 1),
           "pct_of_roofline": round(pct, 1),
           "audited": bool(valid), "m": m, "frames_per_step": f_step,
           "bytes_per_frame": bpf, "window_iters": iters,
           "audit": "single-launch resident buffers, per-frame counts "
                    "diffed vs oracle"}
    # Same-session COMPUTE ceiling (mmctrl: prod's launch structure and
    # matmul shapes with trivial operand prep — mv_bench docstring): the
    # 17% roofline figure above is arithmetic intensity, not waste, and
    # the JSON must prove that by itself (round-4 verdict item 4).  A
    # failed control leg degrades to the primary numbers alone.
    try:
        run_c = mv_bench.build_variant("mmctrl", geom, cfg, k=k, b=b,
                                       m=m, iters=iters, fps=f_step)
        np.asarray(run_c(*d_args))         # compile + one full pass
        t0 = time.perf_counter()
        out_c = np.asarray(run_c(*d_args))
        dt_c = time.perf_counter() - t0
        geom_cells = geom.padded_gh * geom.padded_gw
        exp_c = geom_cells * (
            ((dst_x[last] ^ src_x[last]) & (dst_y[last] ^ src_y[last])
             & 1).astype(np.int64).sum(axis=1))
        ok_c = np.array_equal(out_c.astype(np.int64), exp_c)
        fps_c = b * iters / dt_c
        valid_c, _, _ = _audit("fused MV compute control (mmctrl)",
                               fps_c, bpf, roofline, ok_c)
        rec["compute_control"] = {
            "name": "mmctrl", "frames_per_sec": round(fps_c),
            "audited": bool(valid_c),
            "audit": "same-session mmctrl: prod's launch structure + "
                     "matmul shapes, trivial operand prep — the "
                     "one-hot-scatter formulation's arithmetic floor"}
        if valid_c and fps_c > 0:
            rec["pct_of_compute_control"] = round(100.0 * fps_meas
                                                  / fps_c, 1)
    except Exception as e:  # noqa: BLE001 — control leg is best-effort
        print(f"fused MV compute control failed: {e}", file=sys.stderr)
    # Round-5 ragged chunk-in-grid HYBRID at the PRODUCT capacity regime
    # (M=8192, realistic sparse densities — log-uniform 64..2048, the
    # distribution real 1080p streams show): the regime round 4 flagged
    # at 32% of its stream control.  The JSON must carry the closing
    # number by itself (the round-4 lesson: proofs that live only in
    # PERFORMANCE.md get re-flagged).  Best-effort like the control leg.
    try:
        m8 = 8192
        it8 = int(os.environ.get("MVT_BENCH_MV8_ITERS", 4096))
        dst_x8 = rng.integers(-32, 1952, size=(k, b, m8)).astype(np.int32)
        dst_y8 = rng.integers(-32, 1112, size=(k, b, m8)).astype(np.int32)
        src_x8 = (dst_x8 - rng.integers(-8, 9, size=(k, b, m8))).astype(
            np.int32)
        src_y8 = (dst_y8 - rng.integers(-8, 9, size=(k, b, m8))).astype(
            np.int32)
        counts8 = np.minimum(np.exp(rng.uniform(
            np.log(64), np.log(2049), size=(k, b))).astype(np.int32), m8)
        run8 = mv_bench.build_variant("prodraghyb", geom, cfg, k=k, b=b,
                                      m=m8, iters=it8, fps=f_step)
        flat8 = lambda a: jax.device_put(
            np.ascontiguousarray(a.reshape(k * b, 1, m8)))
        d8 = (flat8(dst_x8), flat8(dst_y8), flat8(src_x8), flat8(src_y8),
              None, jax.device_put(counts8.reshape(k * b)))
        np.asarray(run8(*d8))              # compile + one full pass
        t0 = time.perf_counter()
        out8 = np.asarray(run8(*d8))
        dt8 = time.perf_counter() - t0
        last8 = (it8 - 1) % k
        _, exp8 = mv_vote.host_expected_clusters(
            dst_x8[last8], dst_y8[last8], src_x8[last8], src_y8[last8],
            counts8[last8], geom, threshold_sq=cfg.mv_threshold_sq,
            block_shift=cfg.block_shift, vectors_needed=cfg.vectors_needed)
        ok8 = np.array_equal(out8.astype(np.int64), exp8)
        fps8 = b * it8 / dt8
        # ragged DMA is count-sized: per step, nc_j blocks of
        # [F, 1, m_chunk] i32 per stream (mirrors mv_bench's accounting)
        m_chunk = 2048
        cg8 = counts8.reshape(k, b // f_step, f_step)
        ncs8 = np.clip(-(-cg8.max(axis=2) // m_chunk), 1, m8 // m_chunk)
        bpf8 = float(ncs8.mean()) * 16 * m_chunk
        valid8, implied8, pct8 = _audit(
            "fused MV ragged hybrid M=8192 sparse", fps8, bpf8,
            roofline, ok8)
        rec["ragged_m8192_sparse"] = {
            "frames_per_sec": round(fps8),
            "implied_hbm_gbps": round(implied8, 1),
            "pct_of_roofline": round(pct8, 1),
            "audited": bool(valid8), "m": m8, "m_chunk": m_chunk,
            "mean_count": round(float(counts8.mean()), 1),
            "window_iters": it8,
            "audit": "round-5 ragged chunk-in-grid hybrid (product "
                     "default at m > m_chunk), count-sized DMA "
                     "accounting, per-frame counts diffed vs oracle"}
        if rec.get("compute_control", {}).get("audited"):
            # the M=2048 matmul floor bounds single-chunk frames — the
            # hybrid's sparse regime should sit just under it
            rec["ragged_m8192_sparse"]["pct_of_m2048_floor"] = round(
                100.0 * fps8 / rec["compute_control"]["frames_per_sec"], 1)
    except Exception as e:  # noqa: BLE001 — best-effort
        print(f"fused MV ragged M=8192 leg failed: {e}", file=sys.stderr)
    return rec


def _sad_secondary(cfg, roofline):
    """Audited honest-window block-SAD number for the headline JSON —
    the exact production kernel (ops/sad.make_sad_kernel, F from
    sad_frames_per_step) via sad_bench's chained single-launch harness,
    per-frame counts diffed against the oracle restatement."""
    import jax

    from mvtrim_tpu.core.types import GridGeometry
    from mvtrim_tpu.core.oracle import count_clusters_batch
    from mvtrim_tpu.ops import sad as sad_ops

    sad_bench = _load_bench_module("sad_bench")
    geom = GridGeometry.build(1920, 1080, cfg)
    bs = cfg.block_size
    h_p, w_p = geom.padded_gh * bs, geom.padded_gw * bs
    k, b = 4, 129
    iters = int(os.environ.get("MVT_BENCH_SAD_ITERS", 2048))
    rng = np.random.default_rng(7)
    stack = rng.integers(0, 200, size=(k, 1, h_p, w_p),
                         dtype=np.uint8).repeat(b, axis=1)
    for kk in range(k):
        for i in range(1, b, 3):
            y = 64 + (i * 37) % (h_p - 200)
            x = 64 + (i * 53) % (w_p - 200)
            stack[kk, i, y:y + 120, x:x + 120] = 255

    run = sad_bench.build_variant("prod", geom, cfg, k=k, b=b,
                                  iters=iters)
    prod_inputs = (
        jax.device_put(np.ascontiguousarray(stack[:, 0])),
        jax.device_put(np.ascontiguousarray(
            stack[:, 1:].reshape(k * (b - 1), h_p, w_p))))
    np.asarray(run(prod_inputs))           # compile + one full pass
    t0 = time.perf_counter()
    out = np.asarray(run(prod_inputs))
    dt = time.perf_counter() - t0

    bound = sad_ops.sad_threshold_sum(cfg.sad_threshold, bs)
    last = (iters - 1) % k
    chunks = []
    for lo in range(0, b - 1, 32):
        hi = min(lo + 32, b - 1)
        x = stack[last, lo:hi + 1].astype(np.int32)
        diff = np.abs(x[1:] - x[:-1])
        sad = diff.reshape(-1, geom.padded_gh, bs, geom.padded_gw, bs
                           ).sum(axis=(2, 4))[:, :geom.gh, :geom.gw]
        chunks.append(count_clusters_batch(
            (sad >= bound).astype(np.uint8), vectors_needed=1,
            y_min=geom.y_min, y_max=geom.y_max))
    ok = np.array_equal(out, np.concatenate(chunks))
    fps_meas = (b - 1) * iters / dt
    valid, implied, pct = _audit("SAD 1080p (single-launch)", fps_meas,
                                 h_p * w_p, roofline, ok)
    rec = {"frames_per_sec": round(fps_meas),
           "implied_hbm_gbps": round(implied, 1),
           "pct_of_roofline": round(pct, 1),
           "audited": bool(valid),
           "frames_per_step": sad_ops.sad_frames_per_step(geom, bs),
           "bytes_per_frame": h_p * w_p, "window_iters": iters,
           "audit": "single-launch chained steps, per-frame counts "
                    "diffed vs oracle"}
    # Same-session COMPUTE ceiling (comp: the exact production kernel
    # body with the frames-block index held constant, so the block is
    # VMEM-resident — sad_bench.parse_comp): proves in the JSON itself
    # that the gap to the stream control is arithmetic, not waste
    # (round-4 verdict item 4).  Best-effort: a failed leg degrades to
    # the primary numbers alone.
    try:
        run_c = sad_bench.build_variant("comp", geom, cfg, k=k, b=b,
                                        iters=iters)
        np.asarray(run_c(prod_inputs))     # compile + one full pass
        t0 = time.perf_counter()
        out_c = np.asarray(run_c(prod_inputs))
        dt_c = time.perf_counter() - t0
        exp_c, fetched = sad_bench.comp_expected("comp", stack[last],
                                                 geom, cfg, b)
        ok_c = np.array_equal(out_c.astype(np.int64), exp_c)
        fps_c = (b - 1) * iters / dt_c
        bpf_c = h_p * w_p * fetched / (b - 1)  # true resident-block HBM
        valid_c, _, _ = _audit("SAD 1080p compute control (comp)",
                               fps_c, bpf_c, roofline, ok_c)
        rec["compute_control"] = {
            "name": "comp", "frames_per_sec": round(fps_c),
            "audited": bool(valid_c),
            "audit": "same-session comp: production kernel body over a "
                     "VMEM-resident block (~64x less HBM traffic) — the "
                     "formulation's arithmetic ceiling"}
        if valid_c and fps_c > 0:
            rec["pct_of_compute_control"] = round(100.0 * fps_meas
                                                  / fps_c, 1)
    except Exception as e:  # noqa: BLE001 — control leg is best-effort
        print(f"SAD compute control failed: {e}", file=sys.stderr)
    return rec


def main() -> int:
    t0_main = time.perf_counter()
    import jax

    from mvtrim_tpu.core.config import Config
    from mvtrim_tpu.core import oracle
    from mvtrim_tpu.core.types import GridGeometry
    from mvtrim_tpu.ops import cluster as cluster_ops

    dev = jax.devices()[0]
    roofline = _roofline_gbps(dev)
    print(f"device: {dev} (HBM roofline {roofline:.0f} GB/s)",
          file=sys.stderr)

    cfg = Config()
    geom = GridGeometry.build(1920, 1080, cfg)
    rng = np.random.default_rng(0)

    import os
    K = 8
    B = int(os.environ.get("MVT_BENCH_B", 8192))
    ITERS = int(os.environ.get("MVT_BENCH_ITERS", 4096))
    # Headline / control window: the tunnel charges a FIXED ~28ms per
    # dispatch (measured: an iters=8 launch takes 28.5ms wall); at the
    # 4096-iter window (~107ms launch) that deflates every number ~25%
    # and compresses kernel-vs-control ratios.  The headline candidate,
    # the stream controls, and the 4K pair use a 12x window (~0.7-1.3s
    # launch, fixed cost <4%); secondaries keep the short window and are
    # labeled as such in PERFORMANCE.md.
    ITERS_HEAD = int(os.environ.get("MVT_BENCH_ITERS_HEAD", 12 * ITERS))
    grids = rng.integers(0, 6, size=(K, B, geom.gh, geom.gw),
                         dtype=np.uint8)
    # oracle ground truth per buffer (motion = clusters >= needed)
    need = oracle.effective_clusters_needed(cfg.clusters_needed)
    motion_per_buf = [
        int((oracle.count_clusters_batch(
            g, vectors_needed=cfg.vectors_needed,
            y_min=geom.y_min, y_max=geom.y_max) >= need).sum())
        for g in grids]

    padded = np.zeros((K, B, geom.padded_gh, geom.padded_gw), np.uint8)
    padded[:, :, :geom.gh, :geom.gw] = grids
    stacked = jax.device_put(padded)
    grid_bytes = geom.padded_gh * geom.padded_gw  # uint8 HBM read per frame

    def run(name, op, buf, bytes_per_frame, iters=ITERS):
        dt, total = _chained_bench(op, buf, iters)
        fps = B / dt
        ok = total == _expected_total(motion_per_buf, K, iters)
        valid, implied, pct = _audit(name, fps, bytes_per_frame,
                                     roofline, ok)
        if not valid:  # re-measure once with a longer window
            dt, total = _chained_bench(op, buf, iters * 4)
            fps = B / dt
            ok = total == _expected_total(motion_per_buf, K, iters * 4)
            valid, implied, pct = _audit(f"{name}(re)", fps,
                                         bytes_per_frame, roofline, ok)
        return fps, implied, pct, valid, ok

    # --- primary: the word-domain product path (MVT_SCAN_INPUT=bits) ---
    packed = np.packbits(grids >= cfg.vectors_needed, axis=3,
                         bitorder="little")
    gww, usedw, lanesw = cluster_ops.word_geometry(geom)
    flatw = np.zeros((K, B, lanesw), np.int32)
    flatw[:, :, :usedw] = cluster_ops.repack_bits_words(
        packed.reshape(K * B, geom.gh, -1), geom).reshape(K, B, usedw)
    stacked_words = jax.device_put(flatw)
    word_bytes = lanesw * 4

    # Candidates in descending expected speed; the headline JSON is
    # emitted as soon as ONE candidate passes the audit, so on days when
    # the remote compile service is degraded (500s+ per program) a
    # driver timeout cannot lose the metric — the remaining candidates
    # then run as informational secondaries.
    stacked_T = None

    def get_stacked_T():
        nonlocal stacked_T
        if stacked_T is None:
            stacked_T = jax.device_put(
                np.ascontiguousarray(flatw.transpose(0, 2, 1)))
        return stacked_T

    def cand_words_T():
        dt, total = _sweep_bench_words_T(geom, cfg, get_stacked_T(),
                                         ITERS_HEAD)
        return (B / dt,
                total == _expected_total(motion_per_buf, K, ITERS_HEAD),
                None)

    # Fallback candidates measure at the HEADLINE window while they are
    # still in the running: publishing a fallback at the short window
    # would deflate the metric of record ~25% (the fixed-dispatch-cost
    # artifact above) and divide it by a long-window control.  Once the
    # headline is taken they re-run as short-window secondaries.
    def cand_words_pallas(iters=None):
        iters = ITERS if iters is None else iters
        dt, total = _sweep_bench_packed(geom, cfg, stacked_words, iters,
                                        domain="words")
        return (B / dt,
                total == _expected_total(motion_per_buf, K, iters),
                None)

    def cand_words_xla(iters=None):
        iters = ITERS if iters is None else iters
        op = cluster_ops.make_cluster_words_op_xla(geom, cfg.clusters_needed)
        # run() audits internally; pass its true checksum flag through
        # separately so a roofline-only failure isn't misrecorded as an
        # oracle mismatch in failed_candidates
        fps, _, _, valid, ok = run("words xla", op, stacked_words,
                                   word_bytes, iters=iters)
        return fps, ok, valid

    headline = None
    best_unaudited = (0.0, "none")
    failed_candidates = []  # machine-visible record of every skipped or
    # audit-failed candidate ABOVE the published one — an oracle-checksum
    # failure of the product-default kernel must surface in the metric of
    # record even when a slower fallback passes (ADVICE r2)
    remaining = [("pallas-words-T", "words-T pallas sweep", cand_words_T),
                 ("pallas-words", "words pallas sweep", cand_words_pallas),
                 ("xla-words", "words xla", cand_words_xla)]
    while remaining and headline is None:
        impl, label, fn = remaining.pop(0)
        try:
            fps, checksum_ok, pre_valid = (fn() if impl == "pallas-words-T"
                                           else fn(iters=ITERS_HEAD))
        except Exception as e:  # pallas unavailable on some backends
            print(f"{label} skipped: {e}", file=sys.stderr)
            failed_candidates.append(
                {"impl": impl, "reason": f"exception: {e}"[:200]})
            continue
        if pre_valid is None:
            valid, gbps, pct = _audit(label, fps, word_bytes, roofline,
                                      checksum_ok)
        else:  # run() already audited the xla path
            valid = pre_valid
            gbps = fps * word_bytes / 1e9
            pct = 100.0 * gbps / roofline
        if valid:
            headline = (fps, gbps, pct, impl)
        else:
            failed_candidates.append(
                {"impl": impl,
                 "reason": ("oracle checksum mismatch" if not checksum_ok
                            else "roofline violation"),
                 "unaudited_fps": round(fps)})
            if fps > best_unaudited[0]:
                best_unaudited = (fps, impl)

    # Stream-bound control: the practical HBM ceiling of the kernel's
    # exact launch structure (trivial math, same grid/blocks/buffers).
    # Measured BEFORE the headline JSON so BENCH_rN.json records both
    # kernel and control GB/s (VERDICT r2 directive 1); guarded so a
    # control failure can never lose the headline.
    control = None
    try:
        odd_per_buf = (flatw & 1).sum(axis=(1, 2))
        dt_c, total_c = _sweep_control_T(get_stacked_T(), ITERS_HEAD)
        fps_c = B / dt_c
        ok_c = total_c == _expected_total(odd_per_buf, K, ITERS_HEAD)
        valid_c, gbps_c, pct_c = _audit("words-T stream control", fps_c,
                                        word_bytes, roofline, ok_c)
        if valid_c:
            control = (gbps_c, pct_c)
    except Exception as e:
        print(f"stream control skipped: {e}", file=sys.stderr)

    # Audited per-family secondaries measured BEFORE the headline JSON so
    # BENCH_rNN.json carries all three kernel families (words-T, SAD,
    # mv_raw) honest-window and audited, with no external pointer
    # (VERDICT r3 item 5).  Guarded: a failure or a blown time budget
    # degrades to a missing field, never a lost headline.
    mv_rec = sad_rec = None
    deadline = t0_main + float(os.environ.get("MVT_BENCH_DEADLINE_S",
                                              "1800"))
    try:
        if time.perf_counter() < deadline:
            mv_rec = _mv_secondary(geom, cfg, roofline)
        else:
            print("fused MV secondary skipped: bench deadline",
                  file=sys.stderr)
    except Exception as e:
        print(f"fused MV secondary skipped: {e}", file=sys.stderr)
    try:
        if time.perf_counter() < deadline:
            sad_rec = _sad_secondary(cfg, roofline)
        else:
            print("SAD secondary skipped: bench deadline",
                  file=sys.stderr)
    except Exception as e:
        print(f"SAD secondary skipped: {e}", file=sys.stderr)

    rec = {
        "metric": "1080p_scan_frames_per_sec_per_chip",
        "unit": "frames/s",
        "roofline_gbps": roofline,
        "bytes_per_frame": word_bytes,
        "audit": "single-launch resident accumulator, oracle checksum, "
                 "roofline gate",
    }
    if control is not None:
        rec.update(control_gbps=round(control[0], 1),
                   control_pct_roofline=round(control[1], 1))
    if headline is not None:
        fps, gbps, pct, impl = headline
        rec.update(value=round(fps), vs_baseline=round(fps / 50000.0, 2),
                   impl=impl, implied_hbm_gbps=round(gbps, 1),
                   pct_of_roofline=round(pct, 1))
        if control is not None:
            rec.update(pct_of_control=round(100.0 * gbps / control[0], 1))
    else:
        # never pass off an unaudited number as the metric of record
        rec.update(value=0, vs_baseline=0.0, impl=best_unaudited[1],
                   audit_failed=True, unaudited_fps=round(best_unaudited[0]))
    if failed_candidates:
        # ADVICE r2: an audit failure of a faster candidate (in particular
        # the product-default kernel) must be machine-visible in the
        # metric of record even when a slower fallback passes
        rec["failed_candidates"] = failed_candidates
    if mv_rec is not None:
        rec["secondary_mv_fused"] = mv_rec
    if sad_rec is not None:
        rec["secondary_sad_1080p"] = sad_rec
    print(json.dumps(rec), flush=True)

    # Secondaries run AFTER the headline JSON is flushed so a driver
    # timeout mid-compile cannot lose the metric.
    for impl, label, fn in remaining:
        try:
            fps, checksum_ok, pre_valid = fn()
            # pre_valid is not None <=> the candidate audited internally
            # (xla-words' run()); don't audit those twice
            if pre_valid is None:
                _audit(label, fps, word_bytes, roofline, checksum_ok)
        except Exception as e:
            print(f"{label} skipped: {e}", file=sys.stderr)

    # --- secondary: byte-domain kernel (the transfer-optimal archive
    # variant: uint8 lanes, 1020 B/frame on the wire) ---
    try:
        _, usedb, lanesb = cluster_ops.packed_geometry(geom)
        flatb = np.zeros((K, B, lanesb), np.uint8)
        flatb[:, :, :usedb] = packed.reshape(K, B, usedb)
        dt, total = _sweep_bench_packed(
            geom, cfg, jax.device_put(flatb), ITERS, domain="bytes")
        fps_b = B / dt
        ok = total == _expected_total(motion_per_buf, K, ITERS)
        _audit("bytes pallas sweep", fps_b, lanesb, roofline, ok)
    except Exception as e:
        print(f"bytes pallas bench skipped: {e}", file=sys.stderr)

    # --- secondary: 4K geometry through the word kernel (BASELINE
    # config 3's UHD grid: 240x135 -> 1152 word lanes/frame) ---
    try:
        geom4k = GridGeometry.build(3840, 2160, cfg)
        _, used4k, lanes4k = cluster_ops.word_geometry(geom4k)
        B4 = B // 4
        grids4k = rng.integers(0, 6, size=(K, B4, geom4k.gh, geom4k.gw),
                               dtype=np.uint8)
        packed4k = np.packbits(grids4k >= cfg.vectors_needed, axis=3,
                               bitorder="little")
        flat4k = np.zeros((K, B4, lanes4k), np.int32)
        flat4k[:, :, :used4k] = cluster_ops.repack_bits_words(
            packed4k.reshape(K * B4, geom4k.gh, -1),
            geom4k).reshape(K, B4, used4k)
        need4k = oracle.effective_clusters_needed(cfg.clusters_needed)
        motion4k = [
            int((oracle.count_clusters_batch(
                g, vectors_needed=cfg.vectors_needed,
                y_min=geom4k.y_min, y_max=geom4k.y_max) >= need4k).sum())
            for g in grids4k]
        stacked4k_T = jax.device_put(
            np.ascontiguousarray(flat4k.transpose(0, 2, 1)))
        dt, total = _sweep_bench_words_T(geom4k, cfg, stacked4k_T,
                                         ITERS_HEAD)
        fps4k = B4 / dt
        ok = total == _expected_total(motion4k, K, ITERS_HEAD)
        _, gbps4k, _ = _audit("words-T pallas 4K", fps4k, lanes4k * 4,
                              roofline, ok)
        # same-session 4K stream control: if the kernel/control RATIO is
        # stable across sessions, the absolute 4K spread (98-106M f/s
        # across r2 sessions) is platform/tunnel variance, not ours
        odd4k = (flat4k & 1).sum(axis=(1, 2))
        dt_c, total_c = _sweep_control_T(stacked4k_T, ITERS_HEAD)
        ok_c = total_c == _expected_total(odd4k, K, ITERS_HEAD)
        _, gbps4kc, _ = _audit("words-T 4K stream control", B4 / dt_c,
                               lanes4k * 4, roofline, ok_c)
        print(f"4K kernel/control ratio: {gbps4k / gbps4kc:.3f}",
              file=sys.stderr)
    except Exception as e:
        print(f"4K words bench skipped: {e}", file=sys.stderr)

    # --- secondary: uint8 vote-grid kernels (MVT_SCAN_INPUT=grids) ---
    try:
        dt, total = _sweep_bench(geom, cfg, stacked, ITERS)
        fps_pl = B / dt
        ok = total == _expected_total(motion_per_buf, K, ITERS)
        _audit("grids pallas sweep", fps_pl, grid_bytes, roofline, ok)
    except Exception as e:
        print(f"grids pallas bench skipped: {e}", file=sys.stderr)

    try:
        op_xla = cluster_ops.make_cluster_op_xla(
            geom, cfg.vectors_needed, cfg.clusters_needed)
        run("grids xla", op_xla, stacked, grid_bytes, iters=ITERS // 4)
    except Exception as e:
        print(f"grids xla bench skipped: {e}", file=sys.stderr)

    # (The old end-of-run fused-MV secondary — 20 whole-op dispatches
    # through the tunnel, a dispatch-path-bound number that understated
    # the kernel ~7x — is retired: the audited single-launch measurement
    # now rides in the headline record as secondary_mv_fused.)
    return 0


if __name__ == "__main__":
    sys.exit(main())
