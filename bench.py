"""Benchmark: confidential-transfer Groth16 proving throughput on TPU.

Prints ONE JSON line:
  {"metric": "confidential_proofs_per_sec", "value": N, "unit": "proofs/s",
   "vs_baseline": N/100, ...kernel metrics..., ...anon metrics...}
(The baseline north star is 100 proofs/s on a v5p-16 slice; this runs on
whatever single chip the driver provides.)

Fast-path design: the CRS device queries are persisted to
.bench_params_<circuit>_d<domain>.npz on first run (on-device generation
costs ~4 min), the XLA compile cache under .jax_cache keeps warm-run
compiles low, and the JSON line is printed BEFORE the (host-side, slow)
pairing correctness gate so a late failure can never eat the number.  The
gate still runs: a verification failure exits non-zero after printing.

Measurement policy (round-5): all timings are value-fetch synced (`_sync`
— block_until_ready has been observed returning early through the axon
tunnel), the steady state is >=3 reps published as median (min/all reps
in the payload), and the warm-up-derived floor is tagged
verified=false + includes_compile=true until the steady runs land.
"""

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PROOFS_PER_SEC = 100.0
_DIR = os.path.dirname(os.path.abspath(__file__))

# ----------------------------------------------------------------- watchdog
# The driver kills bench at a hard wall (~1600-1800s observed); round 3
# lost its number because the cold-compile warm-up at batch 32 finished
# ~90s after the kill.  This printer guarantees the ONE JSON line lands by
# BENCH_DEADLINE_SECS even if the steady-state run (or the correctness
# gate) is still in flight: whoever calls _publish() first wins, and the
# watchdog publishes the best measurement recorded so far at the deadline.
_T0 = time.time()
# round-3 forensics: the driver wall fell between ~1570 s and ~1600 s
# of bench wall time; publish just before it
DEADLINE = float(os.environ.get("BENCH_DEADLINE_SECS", "1530"))
_result_lock = threading.Lock()
_best: dict = {}
_extras: dict = {}  # kernel/anon metrics merged into the payload
_published = False


def _remaining() -> float:
    return DEADLINE - (time.time() - _T0)


def _record(payload: dict) -> None:
    """Remember the best-so-far measurement (higher proofs/s wins)."""
    with _result_lock:
        if not _best or payload.get("value", 0) >= _best.get("value", 0):
            _best.clear()
            _best.update(payload)


def _extra(metrics: dict) -> None:
    with _result_lock:
        _extras.update(metrics)


def _publish(reason: str = "") -> None:
    """Print the ONE JSON line (first caller wins; later calls no-op)."""
    global _published
    with _result_lock:
        if _published or not _best:
            return
        _published = True
        if reason:
            print(f"# publishing ({reason})", file=sys.stderr, flush=True)
        print(json.dumps({**_best, **_extras}), flush=True)


def _start_watchdog() -> None:
    def run():
        while True:
            left = _remaining()
            if left <= 0:
                _publish("watchdog deadline")
                return
            if _published:
                return
            time.sleep(min(left, 5.0))

    threading.Thread(target=run, daemon=True).start()


def _setup_jax():
    import resource

    try:  # XLA recurses deeply on the big graphs; default stack segfaults
        resource.setrlimit(
            resource.RLIMIT_STACK,
            (resource.RLIM_INFINITY, resource.RLIM_INFINITY),
        )
    except (ValueError, OSError):
        pass

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_DIR, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _sync(x):
    """Force REAL device completion: block_until_ready through the axon
    tunnel has been observed returning early; a value fetch cannot lie.
    Uses the pipeline's CACHED fetch jit (a fresh jit(lambda) per call
    would recompile the fetch and pollute the timing)."""
    import jax
    import numpy as np

    from zerochain_tpu.prover_tpu.pipeline import _fetch_one

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(_fetch_one(leaf))


# ------------------------------------------------------------- CRS cache
def _params_cache_path(cls) -> str:
    """Cache keyed by (circuit, domain size): a cache from a different
    circuit/domain can then never be loaded under the wrong prover
    (round-4 weak spot: filename-only keying)."""
    from zerochain_tpu.groth16 import domain as dom
    from zerochain_tpu.r1cs.system import ConstraintSystem

    cs = ConstraintSystem(track_names=False)
    cls.CIRCUIT().synthesize(cs)
    from zerochain_tpu.groth16.core import _pad_input_constraints

    _pad_input_constraints(cs)
    d = dom.domain_size(cs.num_constraints)
    name = cls.CIRCUIT.__name__.lower()
    return os.path.join(_DIR, f".bench_params_{name}_d{d}.npz")


LEGACY_CACHES = {
    "confidentialtransfer": os.path.join(_DIR, ".bench_params.npz"),
    "anonymoustransfer": os.path.join(_DIR, ".bench_params_anon.npz"),
}


def _load_or_build(cls, toxic: dict):
    t0 = time.time()
    path = _params_cache_path(cls)
    legacy = LEGACY_CACHES.get(cls.CIRCUIT.__name__.lower())
    for p in (path, legacy):
        if p and os.path.exists(p):
            try:
                prover = cls.from_cache(p)
                print(f"# CRS loaded from {os.path.basename(p)} in "
                      f"{time.time()-t0:.1f}s", file=sys.stderr)
                return prover
            except Exception as e:  # noqa: BLE001 — stale/corrupt cache
                print(f"# CRS cache {p} unusable ({type(e).__name__}); "
                      "trying next", file=sys.stderr)

    prover = cls.from_toxic_waste(**toxic)
    print(f"# CRS generated on device in {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    try:
        prover.save_queries(path)
        print(f"# CRS cached to disk in {time.time()-t0:.1f}s",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — cache write is best-effort
        print(f"# CRS cache write failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    return prover


def _get_prover():
    """Device-resident CRS + prover; cached on disk after the first run."""
    from zerochain_tpu.prover_tpu.pipeline import ConfidentialProver

    return _load_or_build(
        ConfidentialProver,
        dict(
            tau=0x1234567890ABCDEF1234,
            alpha=0x9876543210FEDCBA,
            beta=0x1111111122222222,
            gamma=0x3333333344444444,
            delta=0x5555555566666666,
        ),
    )


def _assignments(n):
    from zerochain_tpu.mirror import jubjub as jj
    from zerochain_tpu.mirror.field import S
    from zerochain_tpu.protocol.elgamal import Ciphertext
    from zerochain_tpu.protocol.keys import EncryptionKey, ProofGenerationKey

    out = []
    g_epoch = jj.find_group_hash(b"\x02\x00\x00\x00", b"zcgepoch")
    for i in range(n):
        seed = f"bench-sender-{i}".encode()
        pgk = ProofGenerationKey.from_seed(seed)
        dk = pgk.into_decryption_key()
        ek_s = EncryptionKey.from_decryption_key(dk)
        ek_r = EncryptionKey.from_seed(f"bench-recipient-{i}".encode())
        ct = Ciphertext.encrypt(27, (0xABCDEF + i) % S, ek_s)
        out.append(
            dict(
                amount=10, remaining_balance=16, fee=1, dec_key=dk.fs,
                randomness=(0x1337C0DE + i) % S, alpha=(41 + i) % S,
                enc_key_recipient=ek_r.point, enc_balance_left=ct.left,
                enc_balance_right=ct.right, pgk=pgk.point, g_epoch=g_epoch,
            )
        )
    return out


def _kernel_microbench():
    """Pallas fused-REDC field-mul throughput, VALUE-FETCH synced.

    Roofline context for the number (see also STATUS.md): one Fq
    Montgomery mul at n=32 12-bit limbs is ~3n^2 ~= 3.1e3 int32 MACs
    (school n^2 + REDC 2n^2).  A v5e core's 4 VPU MXU-adjacent vector
    units sustain on the order of ~1e12 int32 MACs/s, so the ceiling is
    ~3e8 fq muls/s; a dependent-chain timing that reports >1e9/s means
    the chain was NOT actually synced (the round-4 number, 3.0e9/s, was
    block_until_ready through the tunnel returning early)."""
    import jax.numpy as jnp
    import numpy as np

    from zerochain_tpu.ff import limbs as L
    from zerochain_tpu.ff import pallas_ff as P

    out = {}
    B = 1 << 20
    rng = np.random.RandomState(0)
    for spec, name in ((L.FQ, "fq"), (L.FR, "fr")):
        a = jnp.asarray(rng.randint(0, 1 << 12, (spec.n, B)), jnp.int32)
        b = jnp.asarray(rng.randint(0, 1 << 12, (spec.n, B)), jnp.int32)
        acc = P.mont_mul(spec, a, b)
        _sync(acc)
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            acc = P.mont_mul(spec, acc, b)
        _sync(acc)
        out[f"{name}_mul_per_sec"] = round(iters * B / (time.time() - t0))
    return out


def _rand_fr_limbs(rng, shape_tail):
    """(n_limbs, *shape_tail) canonical-range Fr limb array: random
    12-bit limbs with the top limb capped so values stay < 2^255."""
    import jax.numpy as jnp

    from zerochain_tpu.ff import limbs as L

    n = L.FR.n
    arr = rng.randint(0, 1 << 12, (n, *shape_tail))
    arr[n - 1] = rng.randint(0, 1 << (255 - 12 * (n - 1)),
                             shape_tail)
    return jnp.asarray(arr, jnp.int32)


def _full_kernel_bench():
    """BASELINE configs[0,1]: MSM at 2^20 point-scalar pairs (REAL runs,
    not extrapolated) and NTT 2^20 latency on the one attached chip.
    Default-on (BENCH_FULL=0 disables); each sub-bench checks the
    watchdog budget first.  All timings fetch-synced."""
    import jax.numpy as jnp
    import numpy as np

    from zerochain_tpu.ec import g1 as jg1
    from zerochain_tpu.ec.fields import FqOps
    from zerochain_tpu.ff import limbs as L
    from zerochain_tpu.mirror import curves as cv
    from zerochain_tpu.msm import pippenger as pip
    from zerochain_tpu.msm.suffix import SuffixMsm
    from zerochain_tpu.ntt import plan_for

    out = {}
    chunk = int(os.environ.get("ZEROCHAIN_MSM_CHUNK", "16384"))
    n = 1 << 20
    base = jg1.from_affine_host(
        [cv.g1_mul(cv.G1_GEN, 3 + i) for i in range(64)]
    )
    pts_chunk = pip.tmap(
        lambda a: jnp.tile(a, (1,) * (a.ndim - 1) + (chunk // 64,)), base
    )
    rng = np.random.RandomState(0)
    msm = SuffixMsm(FqOps, signed=True)
    from zerochain_tpu.ec import weierstrass as W

    # --- (a) one REAL 2^20 MSM, B=1 (BASELINE configs[1] literally) ---
    if _remaining() > 240:
        n_chunks = n // chunk
        preps1 = [
            msm.prep(msm.digits(_rand_fr_limbs(rng, (chunk, 1))))
            for _ in range(2)
        ]
        acc = msm.window_partials(pts_chunk, prep=preps1[0])
        _sync(acc)  # compile at B=1
        t0 = time.time()
        for i in range(n_chunks):
            part = msm.window_partials(
                pts_chunk, prep=preps1[i % len(preps1)]
            )
            acc = part if i == 0 else W.add(FqOps, acc, part)
        res = msm.combine(acc)
        _sync(res)
        dt = time.time() - t0
        out["msm_2e20_secs"] = round(dt, 3)
        out["msm_2e20_points_per_sec"] = round(n / dt)

    # --- (b) batched MSM throughput at the prover's batch (B=8) -------
    if _remaining() > 180:
        B = 8
        digs = [
            msm.prep(msm.digits(_rand_fr_limbs(rng, (chunk, B))))
            for _ in range(4)
        ]
        _sync(msm.window_partials(pts_chunk, prep=digs[0]))
        iters = max(1, n // (chunk * B))
        t0 = time.time()
        for i in range(iters):
            res = msm.window_partials(pts_chunk, prep=digs[i % len(digs)])
        _sync(res)
        dt = time.time() - t0
        out["msm_g1_point_scalars_per_sec"] = round(iters * chunk * B / dt)

    # --- (c) NTT 2^20 latency -----------------------------------------
    if _remaining() > 200:
        d = 1 << 20
        plan = plan_for(d)
        x = jnp.asarray(
            rng.randint(0, 1 << 12, size=(L.FR.n, 1, d)), jnp.int32
        )
        y = plan.ntt(x)
        _sync(y)
        t0 = time.time()
        for _ in range(5):
            y = plan.ntt(y)
        _sync(y)
        out["ntt_2e20_ms"] = round((time.time() - t0) / 5 * 1e3, 2)
    return out


def _anon_bench(batch):
    """AnonymousTransfer proving throughput: the heavier half of the
    reference's proving surface (~50k constraints, 105 inputs;
    anonymous_transfer.rs:57).  Default-on at B=16; merged into the ONE
    JSON line so the driver artifact carries it."""
    from zerochain_tpu.prover_tpu.pipeline import AnonymousProver

    prover = _load_or_build(
        AnonymousProver,
        dict(tau=0xA11CE, alpha=0xB0B, beta=0xCA51, gamma=0xD00D,
             delta=0xE66),
    )

    from zerochain_tpu.prover_tpu.witness_anon import bench_assignments

    assignments = bench_assignments(batch)
    t0 = time.time()
    proofs = prover.prove(assignments,
                          rs=[(3 + i, 5 + i) for i in range(batch)])
    warm = time.time() - t0
    print(f"# anon warm-up ({batch} proofs): {warm:.1f}s",
          file=sys.stderr)
    out = {
        "anonymous_proofs_per_sec": round(batch / warm, 4),
        "anon_batch": batch,
        "anon_includes_compile": True,
    }
    _extra(out)
    reps = []
    while _remaining() > 90 and len(reps) < 2:
        t0 = time.time()
        proofs = prover.prove(assignments,
                              rs=[(7 + i, 9 + i) for i in range(batch)])
        reps.append(time.time() - t0)
        _extra({
            "anonymous_proofs_per_sec": round(batch / min(reps), 4),
            "anon_steady_state_secs": round(min(reps), 2),
            "anon_batch": batch,
            "anon_includes_compile": False,
        })

    if _remaining() > 60:
        from zerochain_tpu.groth16.core import (
            prepare_verifying_key, verify_proof,
        )

        pvk = prepare_verifying_key(prover.vk)
        pub = prover.public_inputs(assignments[:1])[0]
        assert verify_proof(pvk, proofs[0], pub), "anon proof failed"
        _extra({"anon_verified": True})
        print("# anon proof verified", file=sys.stderr)
    return out


def main():
    _setup_jax()
    _start_watchdog()

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    # chunk-serialization off by default: the blocks don't reliably block
    # through the tunnel anyway, and the B=32 runs are stable without
    os.environ.setdefault("ZEROCHAIN_SERIALIZE_CHUNKS", "0")
    try:
        kernels = _kernel_microbench()
        print(f"# kernel microbench: {kernels}", file=sys.stderr)
        _extra(kernels)
    except Exception as e:  # noqa: BLE001 — microbench must not eat the run
        print(f"# kernel microbench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    prover = _get_prover()
    assignments = _assignments(batch)

    # parallel compile of all pipeline modules — measured WORSE on the
    # axon backend (two concurrent compiles: 107.7 s vs 11.9 s for one;
    # the remote compile helper serializes and thrashes, and tracing is
    # GIL-bound), so this stays opt-in for environments with a real
    # concurrent compiler
    if int(os.environ.get("BENCH_PARALLEL_WARM", "0")):
        t0 = time.time()
        try:
            prover.warm_parallel(assignments)
            print(f"# parallel warm compile: {time.time()-t0:.1f}s",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — fall back to serial warm
            print(f"# parallel warm failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # warm-up (compiles anything the parallel warm missed)
    t0 = time.time()
    proofs = prover.prove(assignments, rs=[(3 + i, 5 + i) for i in range(batch)])
    warm = time.time() - t0
    print(f"# warm-up ({batch} proofs incl. compile): {warm:.1f}s",
          file=sys.stderr)
    # pessimistic floor (includes compile): lets the watchdog publish a
    # real, measured (if degraded) number should the steady run not
    # finish.  Tagged unverified until the post-publish gate runs.
    _record(
        {
            "metric": "confidential_proofs_per_sec",
            "value": round(batch / warm, 4),
            "unit": "proofs/s",
            "vs_baseline": round(batch / warm / BASELINE_PROOFS_PER_SEC, 4),
            "batch": batch,
            "warmup_secs": round(warm, 2),
            "includes_compile": True,
            "verified": False,
        }
    )

    # timed steady-state runs: >= 3 reps, median published (Weak #6)
    reps = []
    n_reps = int(os.environ.get("BENCH_REPS", "3"))
    for rep in range(n_reps):
        t0 = time.time()
        prover.prove(assignments,
                     rs=[(7 + i + rep, 9 + i) for i in range(batch)])
        reps.append(time.time() - t0)
        med = statistics.median(reps)
        _record(
            {
                "metric": "confidential_proofs_per_sec",
                "value": round(batch / med, 4),
                "unit": "proofs/s",
                "vs_baseline": round(
                    batch / med / BASELINE_PROOFS_PER_SEC, 4
                ),
                "batch": batch,
                "steady_state_secs": round(med, 2),
                "steady_secs_min": round(min(reps), 2),
                "steady_reps": [round(r, 2) for r in reps],
                "warmup_secs": round(warm, 2),
            }
        )
        if _remaining() < 30 + med:
            break

    # heavier secondary metric: the anonymous circuit (VERDICT r4 #4) —
    # BEFORE publish so the driver's parsed JSON carries it; its own
    # budget guard keeps the primary number safe
    # anon batch defaults to the SAME batch as confidential: the MSM
    # chunk modules then have identical shapes -> identical computation
    # hashes -> compile-cache hits instead of a second cold Mosaic build
    if int(os.environ.get("BENCH_ANON", "1")) and _remaining() > 420:
        try:
            _anon_bench(int(os.environ.get("BENCH_ANON_BATCH",
                                           str(batch))))
        except Exception as e:  # noqa: BLE001
            print(f"# anon bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # kernel-level metrics (BASELINE configs[0,1]) — also pre-publish
    if int(os.environ.get("BENCH_FULL", "1")) and _remaining() > 240:
        try:
            full = _full_kernel_bench()
            print(f"# full kernel bench: {full}", file=sys.stderr)
            _extra(full)
        except Exception as e:  # noqa: BLE001
            print(f"# full kernel bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # correctness gate: the first proof must verify against the (host
    # mirror) Groth16 verifier and a perturbed input must not.  Runs
    # BEFORE publish when budget allows (so `verified` is truthful in
    # the JSON), else after (the watchdog already has a floor).
    from zerochain_tpu.groth16.core import prepare_verifying_key, verify_proof

    pvk = prepare_verifying_key(prover.vk)
    pub = prover.public_inputs(assignments[:1])[0]
    ok = verify_proof(pvk, proofs[0], pub)
    bad = list(pub)
    bad[0] = (bad[0] + 1) % (2**255)
    bad_rejected = not verify_proof(pvk, proofs[0], bad)
    with _result_lock:
        _best["verified"] = bool(ok and bad_rejected)
    _publish("steady state measured, proof verified" if ok
             else "steady state measured")
    assert ok, "proof failed verification"
    assert bad_rejected, "verifier accepted garbage"
    print("# proof verified against the Groth16 verifier", file=sys.stderr)


def _main_with_retries():
    """The tunneled TPU worker occasionally crashes mid-run; retry in a
    fresh process (device handles don't survive a worker restart)."""
    attempt = int(os.environ.get("_BENCH_ATTEMPT", "0"))
    try:
        main()
    except Exception as e:  # noqa: BLE001
        if _best:
            # a measurement exists: publish it rather than risk losing it
            # to a crash-retry that may not finish before the driver wall
            _publish(f"exception after measurement: {type(e).__name__}")
            raise
        if attempt >= 2:
            raise
        print(f"# attempt {attempt} failed ({type(e).__name__}); retrying",
              file=sys.stderr)
        os.environ["_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


if __name__ == "__main__":
    _main_with_retries()
