"""Benchmark: confidential-transfer Groth16 proving throughput on TPU.

Prints ONE JSON line:
  {"metric": "confidential_proofs_per_sec", "value": N, "unit": "proofs/s",
   "vs_baseline": N/100}
(The baseline north star is 100 proofs/s on a v5p-16 slice; this runs on
whatever single chip the driver provides.)

Fast-path design: the CRS device queries are persisted to
.bench_params.npz on first run (on-device generation costs ~4 min), the
XLA compile cache under .jax_cache keeps warm-run compiles at ~0, and the
JSON line is printed BEFORE the (host-side, slow) pairing correctness
gate so a late failure can never eat the number.  The gate still runs:
a verification failure exits non-zero after printing.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PROOFS_PER_SEC = 100.0
PARAMS_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_params.npz"
)


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
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _get_prover():
    """Device-resident CRS + prover; cached on disk after the first run."""
    from zerochain_tpu.prover_tpu.pipeline import ConfidentialProver

    t0 = time.time()
    if os.path.exists(PARAMS_CACHE):
        try:
            prover = ConfidentialProver.from_cache(PARAMS_CACHE)
            print(f"# CRS loaded from cache in {time.time()-t0:.1f}s",
                  file=sys.stderr)
            return prover
        except Exception as e:  # noqa: BLE001 — stale/corrupt cache
            print(f"# CRS cache unusable ({type(e).__name__}); regenerating",
                  file=sys.stderr)

    prover = ConfidentialProver.from_toxic_waste(
        tau=0x1234567890ABCDEF1234,
        alpha=0x9876543210FEDCBA,
        beta=0x1111111122222222,
        gamma=0x3333333344444444,
        delta=0x5555555566666666,
    )
    print(f"# CRS generated on device in {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    try:
        prover.save_queries(PARAMS_CACHE)
        print(f"# CRS cached to disk in {time.time()-t0:.1f}s",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — cache write is best-effort
        print(f"# CRS cache write failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    return prover


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
    """Pallas fused-REDC field-mul throughput (round-1 XLA path: ~2.3M/s)."""
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
        acc.block_until_ready()
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            acc = P.mont_mul(spec, acc, b)
        acc.block_until_ready()
        out[f"{name}_mul_per_sec"] = round(iters * B / (time.time() - t0))
    return out


def _full_kernel_bench():
    """BASELINE configs[1]-ish: MSM points/s at 2^20 and NTT 2^20 latency
    on the one attached chip.  BENCH_FULL=1 (slow: extra compiles)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zerochain_tpu.ec import g1 as jg1
    from zerochain_tpu.ec.fields import FqOps
    from zerochain_tpu.ff import limbs as L
    from zerochain_tpu.mirror import curves as cv
    from zerochain_tpu.msm import pippenger as pip
    from zerochain_tpu.ntt import plan_for

    out = {}
    # --- MSM 2^20: one base set replicated on device (content-independent
    # throughput; random scalars), timed over the chunked kernel ---
    n = 1 << 20
    chunk = int(os.environ.get("ZEROCHAIN_MSM_CHUNK", "8192"))
    base = jg1.from_affine_host(
        [cv.g1_mul(cv.G1_GEN, 3 + i) for i in range(64)]
    )
    pts_chunk = pip.tmap(
        lambda a: jnp.tile(a, (1,) * (a.ndim - 1) + (chunk // 64,)), base
    )
    rng = np.random.RandomState(0)
    bits = jnp.asarray(rng.randint(0, 2, size=(255, chunk)), jnp.int32)
    msm = pip.Msm(FqOps)
    res = msm(pts_chunk, bits)
    jax.tree_util.tree_leaves(res)[0].block_until_ready()
    t0 = time.time()
    iters = max(1, n // chunk)
    for _ in range(iters):
        res = msm(pts_chunk, bits)
    jax.tree_util.tree_leaves(res)[0].block_until_ready()
    dt = time.time() - t0
    out["msm_g1_points_per_sec"] = round(iters * chunk / dt)
    out["msm_2e20_secs"] = round(dt * (n / (iters * chunk)), 3)

    # --- NTT 2^20 latency ---
    d = 1 << 20
    plan = plan_for(d)
    x = jnp.asarray(rng.randint(0, 1 << 12, size=(L.FR.n, 1, d)), jnp.int32)
    y = plan.ntt(x)
    y.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        y = plan.ntt(y)
    y.block_until_ready()
    out["ntt_2e20_ms"] = round((time.time() - t0) / 5 * 1e3, 2)
    return out


def main():
    _setup_jax()

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    kernels = {}
    try:
        kernels = _kernel_microbench()
        print(f"# kernel microbench: {kernels}", file=sys.stderr)
        if os.environ.get("BENCH_FULL"):
            kernels.update(_full_kernel_bench())
            print(f"# full kernel bench: {kernels}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — microbench must not eat the run
        print(f"# kernel microbench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    prover = _get_prover()
    assignments = _assignments(batch)

    # warm-up (compiles everything; cached across runs via .jax_cache)
    t0 = time.time()
    proofs = prover.prove(assignments, rs=[(3 + i, 5 + i) for i in range(batch)])
    warm = time.time() - t0
    print(f"# warm-up ({batch} proofs incl. compile): {warm:.1f}s",
          file=sys.stderr)

    # timed steady-state run
    t0 = time.time()
    prover.prove(assignments, rs=[(7 + i, 9 + i) for i in range(batch)])
    dt = time.time() - t0
    pps = batch / dt

    print(
        json.dumps(
            {
                "metric": "confidential_proofs_per_sec",
                "value": round(pps, 4),
                "unit": "proofs/s",
                "vs_baseline": round(pps / BASELINE_PROOFS_PER_SEC, 4),
                "batch": batch,
                "steady_state_secs": round(dt, 2),
                **kernels,
            }
        ),
        flush=True,
    )

    # correctness gate AFTER the number: the first proof must verify
    # against the (host mirror) Groth16 verifier and a perturbed input
    # must not.  Runs post-print so a slow/failed gate can't eat the JSON.
    from zerochain_tpu.groth16.core import prepare_verifying_key, verify_proof

    pvk = prepare_verifying_key(prover.vk)
    pub = prover.public_inputs(assignments[:1])[0]
    assert verify_proof(pvk, proofs[0], pub), "proof failed verification"
    bad = list(pub)
    bad[0] = (bad[0] + 1) % (2**255)
    assert not verify_proof(pvk, proofs[0], bad), "verifier accepted garbage"
    print("# proof verified against the Groth16 verifier", file=sys.stderr)


def _main_with_retries():
    """The tunneled TPU worker occasionally crashes mid-run; retry in a
    fresh process (device handles don't survive a worker restart)."""
    attempt = int(os.environ.get("_BENCH_ATTEMPT", "0"))
    try:
        main()
    except Exception as e:  # noqa: BLE001
        if attempt >= 2:
            raise
        print(f"# attempt {attempt} failed ({type(e).__name__}); retrying",
              file=sys.stderr)
        os.environ["_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


if __name__ == "__main__":
    _main_with_retries()
