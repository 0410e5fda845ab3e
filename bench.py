#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Two honest measurement classes (the dev-harness tunnel between this host
and the TPU moves real data at only ~25-30 MB/s each way, so they must be
separated):

- levels: per-level END-TO-END encode+decode MB/s of the full container
  (host-native pipeline: C++ SA-IS/BWT, LZX, TEXT, binary coders, ANS
  lanes...), vs the reference C++ binary running the same level with
  -j 1 on this host (same corpus, same single 2.1 GHz core). This is the
  apples-to-apples whole-tool comparison.
- device: TPU kernel pipeline rates HBM->HBM (batched blocks staged on
  device, timing forced by a dependent scalar transfer) -- what the
  entropy stages run at in production where blocks live in HBM and the
  tunnel cap does not exist.

Headline metric stays ans0_encode_device_MBps (comparable across rounds);
vs_baseline = ours / reference-binary-on-this-host for the same stage.
"""

import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ORACLE = "/tmp/oracle/bin/kanzi"
CACHE = os.path.join(os.path.dirname(__file__), "bench_baseline_cache.json")
CORPUS_MB = 128
# Hard wall-clock budget: round 4's bench was killed by the driver
# (rc=124) inside the device section, losing EVERY number. The bench
# now owns its schedule: levels get the front of the budget (cached
# reference rates stand in when the oracle build or reps would blow
# it), the device section runs in a killable subprocess that journals
# each subsection to disk, and the final JSON line always prints.
BUDGET_S = float(os.environ.get("KANZI_BENCH_BUDGET", "600"))
_T0 = time.monotonic()


def _left() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


# e2e slice per level (MB): big for fast levels, bounded for the per-bit
# coder levels so the whole bench stays under ~10 min on one core
LEVEL_SLICE_MB = {1: 128, 2: 128, 3: 64, 4: 32, 5: 64,
                  6: 32, 7: 32, 8: 16, 9: 8}


def _read_files(paths, cap):
    buf = bytearray()
    for p in paths:
        try:
            with open(p, "rb") as f:
                buf += f.read()
        except OSError:
            continue
        if len(buf) >= cap:
            break
    return bytes(buf[:cap])


def make_corpus(n_mb: int = CORPUS_MB) -> bytes:
    """Deterministic silesia-like corpus, built from 1 MiB segments that
    cycle through content classes so every prefix keeps the same mix:
    real source text, real ELF binaries, synthetic english, random,
    sparse-alphabet, zeros, runs."""
    rng = np.random.default_rng(20260816)
    seg = 1024 * 1024
    n = n_mb * seg

    srcs = []
    for root, _dirs, files in os.walk("/root/reference/src"):
        for fn in sorted(files):
            if fn.endswith((".cpp", ".hpp", ".py", ".md")):
                srcs.append(os.path.join(root, fn))
    srcs.sort()
    code_text = _read_files(srcs, 24 * seg)
    elf = _read_files(sorted(
        os.path.join("/usr/bin", f) for f in os.listdir("/usr/bin")
        if os.path.isfile(os.path.join("/usr/bin", f))
        and not os.path.islink(os.path.join("/usr/bin", f))), 24 * seg)

    words = [b"the", b"of", b"and", b"compression", b"entropy", b"block",
             b"transform", b"stream", b"suffix", b"array", b"kanzi",
             b"parallel", b"device", b"kernel", b"lattice", b"data"]
    idx = rng.integers(0, len(words), 6 * seg)
    eng = b" ".join(words[i] for i in idx[:seg // 4])
    rnd = rng.integers(0, 256, 24 * seg, dtype=np.uint8).tobytes()
    sparse = rng.choice(np.arange(12, dtype=np.uint8), 16 * seg).tobytes()
    runs = bytearray()
    v = 0
    while len(runs) < 8 * seg:
        v = (v + 37) & 0xFF
        runs += bytes([v]) * int(rng.integers(1, 80))
    classes = [code_text, elf, eng * 40, rnd, sparse,
               bytes(8 * seg), bytes(runs)]
    weights = [3, 3, 2, 3, 2, 1, 1]   # segments per cycle, silesia-ish mix
    out = bytearray()
    cursors = [0] * len(classes)
    ci = 0
    while len(out) < n:
        for k, w in enumerate(weights):
            for _ in range(w):
                if len(out) >= n:
                    break
                c = classes[k]
                s = cursors[k] % max(len(c) - seg, 1)
                out += c[s:s + seg]
                cursors[k] += seg
        ci += 1
    return bytes(out[:n])


def _run_ref(args, timeout=900):
    t0 = time.perf_counter()
    r = subprocess.run([ORACLE] + args, capture_output=True, timeout=timeout)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError(r.stderr.decode()[:200])
    return dt


def reference_level(data: bytes, level: int, tmpdir: str):
    """Returns (enc_MBps, dec_MBps, compressed_B, sha256 of the
    compressed stream) for the reference binary at -l level -j 1 on this
    host."""
    src = os.path.join(tmpdir, f"ref_l{level}.bin")
    knz = os.path.join(tmpdir, f"ref_l{level}.knz")
    dec = os.path.join(tmpdir, f"ref_l{level}.dec")
    with open(src, "wb") as f:
        f.write(data)
    mb = len(data) / 1e6
    te = _run_ref(["-c", "-f", "-l", str(level), "-j", "1",
                   "-i", src, "-o", knz])
    td = _run_ref(["-d", "-f", "-j", "1", "-i", knz, "-o", dec])
    size = os.path.getsize(knz)
    with open(knz, "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    with open(dec, "rb") as f:
        if f.read(64) != data[:64]:
            raise RuntimeError("reference roundtrip mismatch")
    for p in (src, knz, dec):
        os.unlink(p)
    return mb / te, mb / td, size, sha


def ours_level(data: bytes, level: int):
    """Host-native end-to-end (device ops disabled: the tunnel would cap
    any device stage at ~25 MB/s and misrepresent both sides). Returns
    (enc_MBps, dec_MBps, size, sha256 of the compressed stream)."""
    import kanzi_tpu.ops as ops
    from kanzi_tpu.app.cli import LEVEL_BLOCK_SIZE, LEVEL_TABLE
    from kanzi_tpu.io.compressed_stream import compress_bytes, \
        decompress_bytes
    t, e = LEVEL_TABLE[level]
    bs = LEVEL_BLOCK_SIZE.get(level, 4 * 1024 * 1024)
    ops.disable()
    try:
        mb = len(data) / 1e6
        t0 = time.perf_counter()
        blob = compress_bytes(data, t, e, block_size=bs)
        te = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = decompress_bytes(blob)
        td = time.perf_counter() - t0
        assert out == data, f"roundtrip mismatch at level {level}"
        return mb / te, mb / td, len(blob), \
            hashlib.sha256(blob).hexdigest()
    finally:
        ops.enable()


def _l5_chain_rate(data: bytes) -> float:
    """Full l5 chain as ONE jitted program, HBM->HBM: BWT + block-codec
    header -> RANK (Pallas SBRT automaton) -> ZRLT -> ANS0 encode core,
    over a 16 x 1 MiB block batch."""
    import jax
    import jax.numpy as jnp
    from kanzi_tpu.core.stats import log2 as _log2
    from kanzi_tpu.ops import ans as dans
    from kanzi_tpu.ops import sbrt as dsb
    from kanzi_tpu.ops.bwt import _sa_bucket
    from kanzi_tpu.parallel.pipeline import _bwt_codec_jnp, _zrlt_forward_jnp

    B = dsb.G                      # 16 blocks = one SBRT grid group
    n = 1 << 20
    npad = _sa_bucket(n)
    lbs = _log2(n) + (1 if n & (n - 1) else 0)
    hdr = 1 + 8 * ((lbs + 7) >> 3)
    m = n + hdr
    lp = -(-m // dsb.WIN_B) * dsb.WIN_B
    zcap = lp + 1024
    s_chunks = n // dans.CHUNK
    sfn = dsb._sbrt_fn(2, False, 1, lp // dsb.WIN_B)

    def chain(blocks):
        def bwt_one(block):
            padded = jnp.zeros(npad, jnp.uint8).at[:n].set(block)
            return _bwt_codec_jnp(padded, n, npad)
        bc = jax.vmap(bwt_one)(blocks)                       # [B, m]
        x = jnp.zeros((B, lp), jnp.uint8).at[:, :m].set(bc)
        w = x.reshape(B, lp // 4, 4).astype(jnp.uint32)
        words = ((w[..., 0] << 24) | (w[..., 1] << 16)
                 | (w[..., 2] << 8) | w[..., 3]).astype(jnp.int32)
        lens2 = jnp.full((B, 128), m, jnp.int32)
        ro = sfn(words, lens2).astype(jnp.uint32)            # [B, lp//4]
        rb = jnp.stack([(ro >> 24) & 0xFF, (ro >> 16) & 0xFF,
                        (ro >> 8) & 0xFF, ro & 0xFF],
                       axis=-1).reshape(B, lp).astype(jnp.uint8)
        zo, zt = jax.vmap(lambda r: _zrlt_forward_jnp(
            r.astype(jnp.int32), zcap))(rb)
        chunks = zo[:, :s_chunks * dans.CHUNK].reshape(
            B * s_chunks, dans.CHUNK)
        freqs, states, fo, ho, lo, plen = dans._encode_core(
            chunks, use_pallas=dans._on_tpu())
        return states, plen, zt

    fn = jax.jit(chain)
    blocks = jnp.asarray(np.frombuffer(data[:B * n], np.uint8)
                         .reshape(B, n))
    st, plen, zt = fn(blocks)
    _ = np.asarray(st[0, 0])
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        st, plen, zt = fn(blocks)
        _ = np.asarray(st[0, 0]), np.asarray(plen[0]), np.asarray(zt[0])
        best = min(best, time.perf_counter() - t0)
    return B * n / 1e6 / best




def device_rates(data: bytes, res: dict, flush, soft_deadline=None):
    """TPU kernel pipeline rates, HBM->HBM. Each subsection journals its
    result into res + flush() so a killed run keeps everything finished
    so far; soft_deadline (time.monotonic value) skips subsections that
    can no longer fit."""
    import jax.numpy as jnp
    from functools import partial
    from kanzi_tpu.ops import ans as dans
    from kanzi_tpu.ops import huffman as dhuff

    def left():
        return (float("inf") if soft_deadline is None
                else soft_deadline - time.monotonic())

    n = 4096 * dans.CHUNK            # 64 MiB
    raw = np.frombuffer(data[:n], np.uint8)

    def sec_ans0_encode():
        chunks = raw.reshape(-1, dans.CHUNK)
        hist = dans.histogram_host(chunks)
        cj = jnp.asarray(chunks)
        hj = jnp.asarray(hist)
        _ = np.asarray(cj[0, 0])
        enc = partial(dans._ans0_encode_impl, use_pallas=dans._on_tpu())
        out = enc(cj, hj)
        _ = np.asarray(out[4][0])
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            out = enc(cj, hj)
            _ = np.asarray(out[4][0])
            best = min(best, time.perf_counter() - t0)
        res["ans0_encode_MBps"] = n / 1e6 / best

    def sec_ans0_decode():
        chunks = raw.reshape(-1, dans.CHUNK)
        c = dans._bucket(chunks.shape[0])
        cj = jnp.asarray(chunks)
        freqs, states, payload, plen = (np.asarray(x) for x in
                                        dans.ans0_encode_chunks_padded(cj))
        offs = (np.cumsum(plen) - plen).astype(np.int32)
        flat = np.zeros(int(plen.sum()), np.uint8)
        for i in range(chunks.shape[0]):
            flat[offs[i]:offs[i] + plen[i]] = payload[i, :plen[i]]
        # batch-sized payload window, exactly like the product decode
        # path (ans0_decode_flat): fewer refills for compressible data
        need = int(max(2, plen.max())) // 2 + 2 + 384
        need = -(-need // 2048) * 2048
        wpad = min(need,
                   -(-(dans.PAYLOAD_MAX // 2 + 2 + 384) // 128) * 128)
        fj = dans._decode_pallas_fn(c, wpad)
        fr = jnp.asarray(freqs.astype(np.int32))
        st = jnp.asarray(states.astype(np.uint32))
        fp = jnp.asarray(np.concatenate([flat,
                                         np.zeros(2 * wpad, np.uint8)]))
        ob = jnp.asarray(offs.astype(np.int32))
        o, cur = fj(fr, st, fp, ob)
        assert np.asarray(o[:chunks.shape[0]]).view(np.uint8).reshape(
            chunks.shape)[0].tobytes() == chunks[0].tobytes()
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            o, cur = fj(fr, st, fp, ob)
            _ = np.asarray(o[0, 0])
            best = min(best, time.perf_counter() - t0)
        res["ans0_decode_MBps"] = n / 1e6 / best

    def sec_huffman_decode():
        from kanzi_tpu.bitstream import BitReader, BitWriter
        from kanzi_tpu.core.context import Context
        from kanzi_tpu.entropy.huffman import HuffmanDecoder, HuffmanEncoder
        ctx = Context({"bsVersion": 6})
        hn = 1024 * dans.CHUNK       # 16 MiB is enough to time the kernel
        obs = BitWriter()
        he = HuffmanEncoder(obs, ctx)
        he.encode(raw[:hn])
        he.dispose()
        blob = obs.getvalue()
        dec = HuffmanDecoder(BitReader(blob), ctx)
        timing = {}
        orig = dec._decode_device

        def timed(outb, queued):
            codes_np = np.stack([np.asarray(q[2], np.int64) & 0xFFF
                                 for q in queued]).astype(np.uint32)
            sizes_np = np.stack([np.asarray(q[1], np.int64)
                                 for q in queued]).astype(np.int32)
            pay = np.stack([q[3] for q in queued])
            nq = codes_np.shape[0]
            b = dhuff._bucket(nq)
            if b != nq:
                codes_np = np.concatenate(
                    [codes_np, np.tile(dhuff._TRIVIAL_CODES, (b - nq, 1))]
                ).astype(np.uint32)
                sizes_np = np.concatenate(
                    [sizes_np, np.tile(dhuff._TRIVIAL_SIZES, (b - nq, 1))]
                ).astype(np.int32)
                pay = np.concatenate(
                    [pay, np.zeros((b - nq,) + pay.shape[1:], np.uint8)])
            pay32 = ((pay[:, :, 0::2].astype(np.int32) << 8)
                     | pay[:, :, 1::2].astype(np.int32)).reshape(
                         b, 4 * dhuff._FRAG_WPAD)
            cjj = jnp.asarray(codes_np)
            sj = jnp.asarray(sizes_np)
            pj = jnp.asarray(pay32)
            oo = dhuff._huff_decode_run(cjj, sj, pj, b)
            _ = np.asarray(oo[0, 0])
            bb = float("inf")
            for _i in range(3):
                t0 = time.perf_counter()
                oo = dhuff._huff_decode_run(cjj, sj, pj, b)
                _ = np.asarray(oo[0, 0])
                bb = min(bb, time.perf_counter() - t0)
            timing["s"] = bb * nq / b
            return orig(outb, queued)

        dec._decode_device = timed
        got = dec.decode(hn)
        assert bytes(got) == raw[:hn].tobytes()
        res["huffman_decode_MBps"] = hn / 1e6 / timing["s"]

    def sec_huffman_encode():
        hch = np.frombuffer(data[:1024 * dans.CHUNK], np.uint8).reshape(
            -1, dans.CHUNK)
        hhist = dans.histogram_host(hch)
        hcj = jnp.asarray(hch)
        hhj = jnp.asarray(hhist)
        henc = partial(dhuff.huffman_encode_chunks,
                       use_pallas=dans._on_tpu())
        out_h = henc(hcj, hhj)
        _ = np.asarray(out_h[3][0])
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            out_h = henc(hcj, hhj)
            _ = np.asarray(out_h[3][0])
            best = min(best, time.perf_counter() - t0)
        res["huffman_encode_MBps"] = hch.size / 1e6 / best

    def sec_ans1_encode():
        # order-1 ANS encode pipeline (bilinear MXU gather + lane scan)
        from kanzi_tpu.ops import ans1 as d1
        from kanzi_tpu.utils import native
        if not (dans._on_tpu() and native.transforms_available()):
            return
        c1 = 16
        a1chunks = np.frombuffer(data[:c1 * d1.CHUNK1],
                                 np.uint8).reshape(c1, d1.CHUNK1)
        a1freqs = np.stack([native.ans1_norm(native.ans1_hist(ch))
                            for ch in a1chunks])
        cj1 = jnp.asarray(a1chunks)
        m1 = jnp.asarray(d1.planes_from_freqs_np(a1freqs))
        lut1 = jnp.asarray(d1.INV_LUT)
        run1 = d1._batch_fn(c1, d1.CHUNK1 // 4)
        st1, _fl, _pl = run1(cj1, m1, lut1)
        _ = np.asarray(st1[0, 0])
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            st1, _fl, _pl = run1(cj1, m1, lut1)
            _ = np.asarray(st1[0, 0])
            best = min(best, time.perf_counter() - t0)
        res["ans1_encode_MBps"] = c1 * d1.CHUNK1 / 1e6 / best

    def sec_lz_match():
        # device LZ match-finding pass (hash + prev-occurrence sort +
        # capped LCP for every position of a 1 MiB block)
        from kanzi_tpu.ops import lz as dlz
        nb = 1 << 20
        block = np.frombuffer(data[:nb], np.uint8)
        dlz.lz_match_pass(block, 19)          # compile + warm
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            dlz.lz_match_pass(block, 19)
            best = min(best, time.perf_counter() - t0)
        res["lz_match_pass_MBps"] = nb / 1e6 / best

    def sec_bwt():
        # device BWT forward + inverse (sort formulations), one 1 MiB
        # block, staged HBM->HBM (host<->device transfers excluded:
        # the dev tunnel would otherwise dominate)
        from kanzi_tpu.ops.bwt import (_bwt_impl, _bwt_inverse_impl,
                                       _sa_bucket)
        from kanzi_tpu.utils import native
        nb = 1 << 20
        bblock = np.frombuffer(data[:nb], np.uint8)
        npad = _sa_bucket(nb)
        sfwd = np.zeros(npad, np.uint8)
        sfwd[:nb] = bblock
        sfj = jnp.asarray(sfwd)
        nj = jnp.int32(nb)
        o = _bwt_impl(sfj, nj, npad)
        _ = np.asarray(o[1])
        best = float("inf")
        for _i in range(2):
            t0 = time.perf_counter()
            o = _bwt_impl(sfj, nj, npad)
            _ = np.asarray(o[1])
            best = min(best, time.perf_counter() - t0)
        res["bwt_forward_1MiB_MBps"] = nb / 1e6 / best

        bwt_b, idx_b = native.bwt_forward(bblock.copy(), 8)
        sinv = np.zeros(npad, np.uint8)
        sinv[:nb] = bwt_b
        sij = jnp.asarray(sinv)
        pj = jnp.int32(int(idx_b[0]))
        oi = _bwt_inverse_impl(sij, nj, pj, npad)
        assert np.asarray(oi)[:nb].tobytes() == bblock.tobytes()
        best = float("inf")
        for _i in range(2):
            t0 = time.perf_counter()
            oi = _bwt_inverse_impl(sij, nj, pj, npad)
            _ = np.asarray(oi[:8])
            best = min(best, time.perf_counter() - t0)
        res["bwt_inverse_1MiB_MBps"] = nb / 1e6 / best

    def sec_l5_chain():
        # FULL l5 chain, ONE jitted program HBM->HBM: BWT(+codec header)
        # -> RANK (Pallas SBRT) -> ZRLT -> ANS0 encode core, per 16-block
        # batch of 1 MiB blocks (the per-chip GB/s story for the
        # flagship level)
        res["l5_chain_MBps"] = _l5_chain_rate(data)

    def sec_fpaq():
        # FPAQ batched encode kernel (64 lockstep streams; l6 entropy)
        from kanzi_tpu.ops import fpaq as dfp
        Lf = 64 * 1024
        fstreams = np.frombuffer(data[:dfp.NS * Lf], np.uint8).reshape(
            dfp.NS, Lf)
        flens = np.full(dfp.NS, Lf, np.int32)
        dfp.fpaq_encode_batch(fstreams, flens)     # compile + warm
        best = float("inf")
        for _i in range(2):
            t0 = time.perf_counter()
            dfp.fpaq_encode_batch(fstreams, flens)
            best = min(best, time.perf_counter() - t0)
        res["fpaq_encode_MBps"] = dfp.NS * Lf / 1e6 / best

    # ordered by (headline first, then importance / compile cost);
    # min_s = minimum believable budget for a cold compile + 3 reps
    sections = [
        ("ans0_encode_MBps", sec_ans0_encode, 30),
        ("ans0_decode_MBps", sec_ans0_decode, 40),
        ("huffman_decode_MBps", sec_huffman_decode, 40),
        ("huffman_encode_MBps", sec_huffman_encode, 30),
        ("ans1_encode_MBps", sec_ans1_encode, 30),
        ("lz_match_pass_MBps", sec_lz_match, 30),
        ("bwt", sec_bwt, 60),
        ("fpaq_encode_MBps", sec_fpaq, 45),
        # LAST: this program has never compiled through the axon
        # tunnel (deep XLA lowering failure under investigation); the
        # journaled sections above survive if it eats the child budget
        ("l5_chain_MBps", sec_l5_chain, 120),
    ]
    for key, fn, min_s in sections:
        if left() < min_s:
            res[key] = "skipped: bench budget"
            flush()
            continue
        try:
            fn()
        except Exception as e:
            res[key] = f"{type(e).__name__}: {e}"[:140]
        flush()


def device_child(out_path: str) -> int:
    """Subprocess entry: run the device section alone, journaling every
    subsection result to out_path so a parent-side kill keeps whatever
    finished."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    soft = os.environ.get("KANZI_BENCH_CHILD_SOFT_S")
    deadline = (time.monotonic() + float(soft)) if soft else None
    data = make_corpus(64)           # device sections use <= 64 MiB
    res = {}

    def flush():
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(res, f)
        os.replace(tmp, out_path)

    try:
        device_rates(data, res, flush, soft_deadline=deadline)
    except Exception as e:           # import-time / setup failure
        res["error"] = f"{type(e).__name__}: {e}"[:200]
    flush()
    return 0


def start_oracle_build():
    """Kick off the reference cmake+ninja build in the background (it
    shares this 1-core host, but levels can't start without it anyway
    and the binary is cached at /tmp/oracle across runs)."""
    if os.path.exists(ORACLE):
        return None
    script = (
        "mkdir -p /tmp/oracle/build /tmp/oracle/bin && "
        "cd /tmp/oracle/build && "
        "cmake /root/reference -DCMAKE_BUILD_TYPE=Release -G Ninja && "
        "ninja kanzi_static && cp kanzi_static " + ORACLE)
    return subprocess.Popen(["bash", "-c", script],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)


def oracle_ready(proc, timeout: float) -> bool:
    if proc is None:
        return os.path.exists(ORACLE)
    try:
        proc.wait(timeout=max(0.0, timeout))
    except subprocess.TimeoutExpired:
        return False
    return os.path.exists(ORACLE)


# parent keeps this much budget for the device subprocess + writeout
DEV_RESERVE_S = 260.0


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--device-json":
        return device_child(sys.argv[2])
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    oproc = start_oracle_build()
    data = make_corpus()
    tag = hashlib.sha256(data[:1 << 20]).hexdigest()[:12] + f"-{len(data)}"

    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    if cache.get("tag") != tag:
        cache = {"tag": tag, "levels": {}}

    have_ref = oracle_ready(
        oproc, min(240.0, max(0.0, _left() - DEV_RESERVE_S - 120.0)))
    ref_cached = cache.get("levels", {})
    levels = {}
    # tmpfs: the reference's 128 MB output hits disk writeback on /tmp
    # (90-750 MB/s swings), which our in-memory side never pays
    _shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(dir=_shm) as td:
        # Reference and our runs are interleaved per level: this host's
        # effective clock drifts +/-15% over tens of minutes, so
        # same-minute pairs are the fairest ratio. Rep policy under the
        # budget: one interleaved rep per level always; extra reps (for
        # best-of noise healing) only while the device reserve holds.
        def _stable(xs):
            if len(xs) < 2:
                return False
            a, b = sorted(xs)[-2:]
            return a >= 0.7 * b

        for level in range(1, 10):
            sl = data[:LEVEL_SLICE_MB[level] * 1024 * 1024]
            key = str(level)
            ent = {"slice_MB": LEVEL_SLICE_MB[level]}
            ref_encs, ref_decs, our_encs, our_decs = [], [], [], []
            rs = rsha = osz = osha = None
            t_lvl = time.monotonic()
            for _rep in range(4):
                cost = time.monotonic() - t_lvl   # ~cost of reps so far
                if _rep == 1 and _left() < DEV_RESERVE_S + cost * (10 - level):
                    break
                if _rep >= 2 and (
                        _left() < DEV_RESERVE_S + cost / _rep * (10 - level)
                        or ((not have_ref or (_stable(ref_encs)
                                              and _stable(ref_decs)))
                            and _stable(our_encs) and _stable(our_decs))):
                    break
                if have_ref:
                    e1, d1, rs, rsha = reference_level(sl, level, td)
                    ref_encs.append(e1)
                    ref_decs.append(d1)
                e2, d2, osz, osha = ours_level(sl, level)
                our_encs.append(e2)
                our_decs.append(d2)
            oe, od = max(our_encs), max(our_decs)
            if have_ref:
                ent.update({"ref_enc_MBps": round(max(ref_encs), 2),
                            "ref_dec_MBps": round(max(ref_decs), 2),
                            "ref_size": rs})
                cache["levels"][key] = {k: ent[k] for k in
                                        ("ref_enc_MBps", "ref_dec_MBps",
                                         "ref_size")}
            elif key in ref_cached:
                ent.update(ref_cached[key])
                ent["ref_from_cache"] = True
            ent.update({"enc_MBps": round(oe, 2),
                        "dec_MBps": round(od, 2),
                        "size": osz})
            if "ref_enc_MBps" in ent:
                ent["enc_vs_ref"] = round(oe / ent["ref_enc_MBps"], 3)
                ent["dec_vs_ref"] = round(od / ent["ref_dec_MBps"], 3)
                ent["size_vs_ref"] = round(osz / ent["ref_size"], 4)
            if have_ref:
                ent["bytes_identical"] = bool(osha == rsha)
            elif key in ref_cached and "ref_size" in ref_cached[key]:
                ent["bytes_identical"] = bool(osz == ref_cached[key]
                                              ["ref_size"])
            levels[key] = ent
        with open(CACHE, "w") as f:
            json.dump(cache, f)

    # device section in a killable subprocess journaling to a file: a
    # hung TPU compile / claimed chip can no longer take down the bench
    dev = {}
    dev_path = os.path.join(tempfile.gettempdir(),
                            f"kanzi_bench_dev_{os.getpid()}.json")
    child_budget = max(90.0, _left() - 40.0)
    env = dict(os.environ)
    env["KANZI_BENCH_CHILD_SOFT_S"] = str(child_budget - 20.0)
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--device-json", dev_path],
            timeout=child_budget, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        dev["timeout"] = f"device child killed at {child_budget:.0f}s"
    except Exception as e:
        dev["error"] = f"{type(e).__name__}: {e}"[:200]
    if os.path.exists(dev_path):
        try:
            with open(dev_path) as f:
                dev.update(json.load(f))
            os.unlink(dev_path)
        except Exception:
            pass
    lg = dict(cache.get("device_last_good") or {})
    fresh = {k: round(v, 2) for k, v in dev.items()
             if isinstance(v, (int, float)) and v is not True}
    if isinstance(dev.get("ans0_encode_MBps"), (int, float)) \
            and dev["ans0_encode_MBps"] > 0:
        lg.update(fresh)
        cache["device_last_good"] = lg
        with open(CACHE, "w") as f:
            json.dump(cache, f)
    else:
        # TPU tunnel down / chip claimed: report honestly (value 0) but
        # surface the last successful run's rates as context
        dev.setdefault("ans0_encode_MBps", 0.0)
    # sections that did not land THIS run (tunnel kill mid-compile: the
    # fused l5-chain program recompiles ~20 min per process — its cache
    # key is unstable — so a budget-capped child rarely reaches it):
    # attach the last successful measurements, clearly labeled
    missing = {k: v for k, v in lg.items()
               if not isinstance(dev.get(k), (int, float))}
    if missing:
        dev["last_good_rates_for_missing_sections"] = missing

    ref_ans0 = cache.get("ans0_ref_MBps")
    ref_ans1 = cache.get("ans1_ref_MBps")
    if have_ref and (ref_ans0 is None or ref_ans1 is None) \
            and _left() > 60:
        with tempfile.TemporaryDirectory(
                dir="/dev/shm" if os.path.isdir("/dev/shm")
                else None) as td:
            src = os.path.join(td, "c.bin")
            with open(src, "wb") as f:
                f.write(data[:64 * 1024 * 1024])
            for key, ent in (("ans0_ref_MBps", "ANS0"),
                             ("ans1_ref_MBps", "ANS1")):
                if cache.get(key) is not None:
                    continue
                dt = min(_run_ref(["-c", "-f", "-t", "NONE", "-e", ent,
                                   "-j", "1", "-i", src, "-o",
                                   os.path.join(td, "c.knz")])
                         for _ in range(2))
                cache[key] = round(64 * 1024 * 1024 / 1e6 / dt, 2)
            ref_ans0 = cache["ans0_ref_MBps"]
            ref_ans1 = cache["ans1_ref_MBps"]
            with open(CACHE, "w") as f:
                json.dump(cache, f)

    value = dev["ans0_encode_MBps"]
    if not isinstance(value, (int, float)):
        value = 0.0
    vs = (value / ref_ans0) if ref_ans0 else 0.0

    # full detail goes to a FILE (the driver only keeps the tail of
    # stdout, which truncated the round-3 device numbers); the printed
    # line stays compact
    detail_full = {
        "corpus_MB": len(data) // (1024 * 1024),
        "budget_s": BUDGET_S,
        "elapsed_s": round(time.monotonic() - _T0, 1),
        "levels_host_e2e": levels,
        "ans0_ref_MBps": round(ref_ans0, 2) if ref_ans0 else None,
        "ans1_ref_MBps": round(ref_ans1, 2) if ref_ans1 else None,
        "device_HBM_to_HBM": {
            k: round(v, 2) if isinstance(v, (int, float)) and v is not True
            else v for k, v in dev.items()},
        "note": ("levels_* compare our host-native pipeline to the "
                 "reference binary at -j 1 on this 1-core host; "
                 "device_* are TPU kernel rates HBM->HBM (the dev "
                 "tunnel caps any host<->device e2e at ~25-30 MB/s)"),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail_full, f, indent=1)

    ratios = {k: [v.get("enc_vs_ref"), v.get("dec_vs_ref")]
              for k, v in levels.items()}
    print(json.dumps({
        "metric": "ans0_encode_device_MBps",
        "value": round(value, 3),
        "unit": "MB/s",
        "vs_baseline": round(vs, 4),
        "detail": {
            "levels_enc_dec_vs_ref": ratios,
            "bytes_identical_all": all(
                v.get("bytes_identical", False) for v in levels.values()),
            "full_detail_file": "BENCH_DETAIL.json",
            "device_HBM_to_HBM": {
                k: round(v, 2) if isinstance(v, (int, float))
                and v is not True else v for k, v in dev.items()},
        }}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
