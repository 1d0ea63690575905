"""Compiled batched witness synthesis for the AnonymousTransfer circuit.

Same design as prover_tpu/witness.py (the ConfidentialTransfer compiler):
the circuit is fixed, so witness generation is a static JAX graph batched
over a trailing proof axis B.  The 12-member anonymity-set machinery of the
reference (core/proofs/src/circuit/anonimity_set.rs:32-483) is naturally
vectorizable — selector masks, the one-hot Σ-folds, and the 12 parallel
`enc_key_i * randomness` chains all carry the anonymity-set axis as an
array dimension.

Aux values are emitted in EXACTLY the allocation order of
models/anonymous.py (validated against the Python synthesis in
tests/test_tpu_witness_anon.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import jubjub as ej
from ..ff import limbs as L
from ..mirror import jubjub as mjj
from ..mirror.field import R
from .witness import (
    ONE_MONT_LIMBS,
    Emitter,
    _affine_add_aux,
    _const,
    _ext_from_affine,
    _normalize_stack,
    affine_mont_host,
    bit_mont,
    bits_le_host,
    compute_fixed_base_chains,
    compute_var_mul_chains,
    emit_add_gadget,
    emit_field_bits,
    emit_fixed_base,
    emit_not_small_order,
    emit_u32_range,
    emit_var_mul,
    emit_witness_point,
    mul,
)

FR = L.FR
ANONIMITY_SIZE = 12


def _ones_like(x):
    return jnp.broadcast_to(_const(ONE_MONT_LIMBS, x.ndim), x.shape)


def _emit_witness_points_vec(em: Emitter, x, y):
    """12 EdwardsPoint::witness gadgets: per point [x, y, x², y², x²y²].

    x, y: (L, K, B)."""
    x2 = mul(x, x)
    y2 = mul(y, y)
    x2y2 = mul(x2, y2)
    block = jnp.stack([x, y, x2, y2, x2y2], axis=2)  # (L, K, 5, B)
    em.emit(block.reshape(FR.n, block.shape[1] * 5, block.shape[-1]))
    return x, y


def _fold_values(bools, px, py):
    """Pure compute of an edwards_add_fold: running affine accs (L, K, B).

    bools (K, B) 0/1; px/py (L, K, B).  Returns (selx, sely, accx, accy)."""
    bmask = bools[None].astype(bool)
    selx = jnp.where(bmask, px, jnp.zeros_like(px))
    sely = jnp.where(bmask, py, _ones_like(py))

    def step(carry, xs):
        sx, sy = xs
        new = ej.add(carry, _ext_from_affine(sx, sy))
        return new, new

    init = ej.identity(bools.shape[1:])
    _, accs = jax.lax.scan(
        step, init, (jnp.moveaxis(selx, 1, 0), jnp.moveaxis(sely, 1, 0))
    )
    accx, accy = _normalize_stack(accs)  # (L, K, B)
    return selx, sely, accx, accy


def _emit_fold(em: Emitter, bools, px, py):
    """Binary::edwards_add_fold aux: per member i the selection [x', y']
    then the add [U, A, B, C, x3, y3] (anonimity_set.rs:157-192).

    Returns the final affine accumulator (x, y) each (L, B)."""
    selx, sely, accx, accy = _fold_values(bools, px, py)
    # the fold starts from the (0, 1) zero_p witness
    prevx = jnp.concatenate([jnp.zeros_like(accx[:, :1]), accx[:, :-1]], axis=1)
    prevy = jnp.concatenate([_ones_like(accy[:, :1]), accy[:, :-1]], axis=1)
    u, a, b, c = _affine_add_aux(prevx, prevy, selx, sely)
    block = jnp.stack([selx, sely, u, a, b, c, accx, accy], axis=2)
    em.emit(block.reshape(FR.n, block.shape[1] * 8, block.shape[-1]))
    return accx[:, -1], accy[:, -1]


def _emit_add_vec(em: Emitter, x1, y1, x2, y2):
    """K independent EdwardsPoint::add gadgets, aux grouped per add.

    All coords (L, K, B); returns (x3, y3)."""
    u, a, b, c = _affine_add_aux(x1, y1, x2, y2)
    ext = ej.add(_ext_from_affine(x1, y1), _ext_from_affine(x2, y2))
    zinv = L.batch_inv_mont(
        FR, ext[2].reshape(FR.n, -1), axis=1
    ).reshape(ext[2].shape)
    x3 = mul(ext[0], zinv)
    y3 = mul(ext[1], zinv)
    block = jnp.stack([u, a, b, c, x3, y3], axis=2)  # (L, K, 6, B)
    em.emit(block.reshape(FR.n, block.shape[1] * 6, block.shape[-1]))
    return x3, y3


def _emit_cond_eq(em: Emitter, bools, ax, ay, bx, by):
    """Binary::conditionally_equals aux: per member the two selections
    [a_x', a_y', b_x', b_y'] (the equality constraints add no aux)."""
    bmask = bools[None].astype(bool)
    sax = jnp.where(bmask, ax, jnp.zeros_like(ax))
    say = jnp.where(bmask, ay, _ones_like(ay))
    sbx = jnp.where(bmask, bx, jnp.zeros_like(bx))
    sby = jnp.where(bmask, by, _ones_like(by))
    block = jnp.stack([sax, say, sbx, sby], axis=2)  # (L, K, 4, B)
    em.emit(block.reshape(FR.n, block.shape[1] * 4, block.shape[-1]))


# ======================================================================
# full AnonymousTransfer witness assembly
# ======================================================================

def anonymous_witness(
    amount_u32,          # (B,) uint32
    remaining_u32,       # (B,) uint32
    s_bits,              # (12, B) one-hot 0/1
    t_bits,              # (12, B) one-hot 0/1
    dec_key_bits,        # (252, B) 0/1
    randomness_bits,     # (252, B)
    alpha_bits,          # (252, B)
    enc_keys,            # (x, y) each (L, 12, B) mont
    left_cts,            # (x, y) each (L, 12, B)
    right_ct_in,         # unused placeholder kept out — see note below
    left_bals,           # (x, y) each (L, 12, B)
    right_bals,          # (x, y) each (L, 12, B)
    pgk,                 # (x, y) each (L, B)
    gep,                 # (x, y) each (L, B)
):
    """-> (aux (L, n_aux, B), public (L, 105, B)), Montgomery limbs.

    Aux order matches models/anonymous.py allocation order exactly.
    (right_ct is recomputed in-graph from randomness_bits — the circuit
    derives it as r*G, anonymous_transfer.rs right elgamal component.)"""
    del right_ct_in
    em = Emitter()
    B = dec_key_bits.shape[1]

    ekx, eky = enc_keys
    clx, cly = left_cts
    lbx, lby = left_bals
    rbx, rby = right_bals

    # ---- upfront compute: fixed-base chains ---------------------------
    # NB: chain order is free; emission order is what must match.
    # amount/remaining bits come from the strict-range gadget, so derive
    # them arithmetically here (same values).
    amount_bits_le = jnp.stack(
        [(amount_u32 >> i) & 1 for i in range(32)], axis=0
    ).astype(jnp.int32)
    remaining_bits_le = jnp.stack(
        [(remaining_u32 >> i) & 1 for i in range(32)], axis=0
    ).astype(jnp.int32)

    fb = compute_fixed_base_chains(
        [
            amount_bits_le,     # 0: amount_g
            remaining_bits_le,  # 1: remaining_balance_g
            dec_key_bits,       # 2: enc_key_sender
            randomness_bits,    # 3: right_ciphertext (r*G)
            alpha_bits,         # 4: alpha_g
        ]
    )
    nw252 = 84
    right_ct = (fb["res_x"][:, nw252 - 2, 3], fb["res_y"][:, nw252 - 2, 3])

    # ---- upfront compute: cr_minus_d, then all 14 var-mul chains ------
    _, _, rf_accx, rf_accy = _fold_values(s_bits, rbx, rby)
    right_fold = (rf_accx[:, -1], rf_accy[:, -1])
    crd_ext = ej.add(
        _ext_from_affine(*right_fold), _ext_from_affine(*right_ct)
    )
    crd_zinv = L.batch_inv_mont(
        FR, crd_ext[2].reshape(FR.n, -1), axis=1
    ).reshape(crd_ext[2].shape)
    cr_minus_d = (mul(crd_ext[0], crd_zinv), mul(crd_ext[1], crd_zinv))

    vm_bases = (
        jnp.concatenate(
            [ekx, cr_minus_d[0][:, None], gep[0][:, None]], axis=1
        ),
        jnp.concatenate(
            [eky, cr_minus_d[1][:, None], gep[1][:, None]], axis=1
        ),
    )  # (L, 14, B)
    rnd = randomness_bits[:, None, :]
    dk = dec_key_bits[:, None, :]
    vm_bits = jnp.concatenate(
        [jnp.broadcast_to(rnd, (252, ANONIMITY_SIZE, B)), dk, dk], axis=1
    )  # (252, 14, B)
    vm = compute_var_mul_chains(vm_bases, vm_bits)

    # ================== emission (circuit allocation order) ============
    # initialize acc.: zero_p witness (0, 1)
    zero_x = jnp.zeros((FR.n, B), jnp.int32)
    one_y = jnp.broadcast_to(_const(ONE_MONT_LIMBS, 2), (FR.n, B))
    emit_witness_point(em, zero_x, one_y)

    emit_u32_range(em, amount_u32)
    amount_g = emit_fixed_base(em, fb, 0, 32)
    emit_u32_range(em, remaining_u32)
    remaining_g = emit_fixed_base(em, fb, 1, 32)

    emit_field_bits(em, dec_key_bits)
    emit_field_bits(em, s_bits)  # Binary::new s (12 plain booleans)
    emit_field_bits(em, t_bits)  # Binary::new t

    _emit_witness_points_vec(em, ekx, eky)  # push enckeys
    _emit_fold(em, s_bits, ekx, eky)  # add folded enc keys
    eks = emit_fixed_base(em, fb, 2, 252)  # compute enc_key_sender
    del eks  # equality is constraint-only (no aux)

    # enc keys multiplied by randomness: bits then 12 var-mul chains
    emit_field_bits(em, randomness_bits)
    emr = [emit_var_mul(em, vm, vm_bits[:, i], i)
           for i in range(ANONIMITY_SIZE)]
    emrx = jnp.stack([p[0] for p in emr], axis=1)  # (L, 12, B)
    emry = jnp.stack([p[1] for p in emr], axis=1)

    _emit_witness_points_vec(em, clx, cly)  # ciphertext_left_set

    fold_t = _emit_fold(em, t_bits, emrx, emry)
    emit_add_gadget(em, *fold_t, *amount_g)  # expected ct left t
    _emit_fold(em, t_bits, clx, cly)  # ct_left_t (equality: no aux)

    xor_bits = jnp.bitwise_xor(s_bits, t_bits)
    emit_field_bits(em, xor_bits)  # s_i xor t_i (12 xor aux)
    _emit_fold(em, xor_bits, emrx, emry)
    _emit_fold(em, xor_bits, clx, cly)

    nor_bits = (1 - s_bits) * (1 - t_bits)
    emit_field_bits(em, nor_bits)  # s_i nor t_i (12 nor aux)
    _emit_cond_eq(em, nor_bits, clx, cly, emrx, emry)

    # (inputize enc key set + ciphertext left set: no aux)

    _emit_witness_points_vec(em, lbx, lby)  # left balance witness
    addx, addy = _emit_add_vec(em, lbx, lby, clx, cly)
    _emit_fold(em, s_bits, addx, addy)  # lh_c

    _emit_witness_points_vec(em, rbx, rby)  # right balance witness
    _emit_fold(em, s_bits, rbx, rby)  # right_fold (values precomputed)

    emit_field_bits(em, randomness_bits)  # second decomposition
    emit_fixed_base(em, fb, 3, 252)  # right_ciphertext = r*G
    emit_add_gadget(em, *right_fold, *right_ct)  # cr_minus_d
    crd_sk = emit_var_mul(em, vm, vm_bits[:, ANONIMITY_SIZE],
                          ANONIMITY_SIZE)
    emit_add_gadget(em, *remaining_g, *crd_sk)  # rh_c (eq: no aux)

    # rvk (utils.rs:71-124)
    emit_witness_point(em, pgk[0], pgk[1])
    emit_not_small_order(em, pgk[0], pgk[1])
    emit_field_bits(em, alpha_bits)
    alpha_g = emit_fixed_base(em, fb, 4, 252)
    rvk = emit_add_gadget(em, pgk[0], pgk[1], *alpha_g)
    emit_not_small_order(em, *rvk)

    # g_epoch / nonce (utils.rs:126-154)
    emit_witness_point(em, gep[0], gep[1])
    nonce = emit_var_mul(em, vm, vm_bits[:, ANONIMITY_SIZE + 1],
                         ANONIMITY_SIZE + 1)

    aux = em.concat()

    # ---- 105 public inputs (anonymous_transfer.rs:454-478) ------------
    def interleave(x, y):  # (L, 12, B) pairs -> [x0, y0, x1, y1, ...]
        return jnp.stack([x, y], axis=2).reshape(FR.n, 2 * ANONIMITY_SIZE, B)

    one = jnp.broadcast_to(_const(ONE_MONT_LIMBS, 2), (FR.n, B))
    public = jnp.concatenate(
        [
            one[:, None],
            interleave(ekx, eky),
            interleave(clx, cly),
            interleave(lbx, lby),
            interleave(rbx, rby),
            jnp.stack(
                [right_ct[0], right_ct[1], rvk[0], rvk[1],
                 gep[0], gep[1], nonce[0], nonce[1]],
                axis=1,
            ),
        ],
        axis=1,
    )
    return aux, public


from .witness import _maybe_forced

anonymous_witness_jit = jax.jit(_maybe_forced(anonymous_witness))


# ---------------------------------------------------------------- host API
def _points_vec_host(lists):
    """[[(x, y)]*12]*B -> (x_limbs, y_limbs) each (L, 12, B) mont."""
    B = len(lists)
    xs = L.to_limbs(
        FR, [p[0] for pts in lists for p in pts], mont=True
    ).reshape(FR.n, B, ANONIMITY_SIZE)
    ys = L.to_limbs(
        FR, [p[1] for pts in lists for p in pts], mont=True
    ).reshape(FR.n, B, ANONIMITY_SIZE)
    return jnp.moveaxis(xs, 1, 2), jnp.moveaxis(ys, 1, 2)


def _one_hot_host(indices, n=ANONIMITY_SIZE):
    arr = np.zeros((n, len(indices)), np.int32)
    for b, i in enumerate(indices):
        arr[int(i), b] = 1
    return jnp.asarray(arr)


def witness_inputs_host(assignments: list[dict]):
    """Per-proof witness dicts with keys: amount, remaining_balance (ints);
    s_index, t_index (ints < 12); dec_key, randomness, alpha (Fs ints);
    enc_keys, left_ciphertexts (12 affine points each); enc_balances
    (12 (left, right) pairs); pgk, g_epoch (affine points)."""
    get = lambda k: [a[k] for a in assignments]
    return dict(
        amount_u32=jnp.asarray(np.array(get("amount"), dtype=np.uint32)),
        remaining_u32=jnp.asarray(
            np.array(get("remaining_balance"), dtype=np.uint32)
        ),
        s_bits=_one_hot_host(get("s_index")),
        t_bits=_one_hot_host(get("t_index")),
        dec_key_bits=bits_le_host(get("dec_key"), 252),
        randomness_bits=bits_le_host(get("randomness"), 252),
        alpha_bits=bits_le_host(get("alpha"), 252),
        enc_keys=_points_vec_host(get("enc_keys")),
        left_cts=_points_vec_host(get("left_ciphertexts")),
        right_ct_in=None,
        left_bals=_points_vec_host(
            [[b[0] for b in a["enc_balances"]] for a in assignments]
        ),
        right_bals=_points_vec_host(
            [[b[1] for b in a["enc_balances"]] for a in assignments]
        ),
        pgk=affine_mont_host(get("pgk")),
        gep=affine_mont_host(get("g_epoch")),
    )


def bench_assignments(n: int) -> list[dict]:
    """Self-contained AnonymousTransfer witness dicts for benchmarking:
    one real sender/recipient pair hidden among 10 decoys
    (ANONIMITY_SIZE=12, core/proofs/src/constants.rs:1-2)."""
    from ..mirror import jubjub as jj
    from ..mirror.field import S
    from ..protocol.elgamal import Ciphertext
    from ..protocol.keys import EncryptionKey, ProofGenerationKey

    g_epoch = jj.find_group_hash(b"\x09\x00\x00\x00", b"zcgepoch")
    out = []
    for k in range(n):
        seed = b"anon-bench-%d" % k
        amount, remaining, current = 10, 90, 100
        s_index, t_index = (3 + k) % 12, (7 + 5 * k) % 12
        if s_index == t_index:
            t_index = (t_index + 1) % 12
        pgk = ProofGenerationKey.from_seed(seed)
        dec_key = pgk.into_decryption_key()
        ek_sender = EncryptionKey.from_decryption_key(dec_key)
        ek_recipient = EncryptionKey.from_seed(seed + b"recipient")
        decoys = [
            EncryptionKey.from_seed(seed + b"decoy %d" % i).point
            for i in range(10)
        ]
        randomness = int.from_bytes(seed.ljust(32, b"r"), "little") % S
        alpha = int.from_bytes(seed.ljust(32, b"a"), "big") % S

        lo, hi = sorted((s_index, t_index))

        def insert_pair(lst, s_val, t_val):
            res = list(lst)
            res.insert(lo, s_val if lo == s_index else t_val)
            res.insert(hi, s_val if hi == s_index else t_val)
            return res

        enc_keys = insert_pair(decoys, ek_sender.point, ek_recipient.point)
        lcs = insert_pair(
            [Ciphertext.encrypt(0, randomness, EncryptionKey(d)).left
             for d in decoys],
            Ciphertext.neg_encrypt(amount, randomness, ek_sender).left,
            Ciphertext.encrypt(amount, randomness, ek_recipient).left,
        )
        balances = insert_pair(
            [Ciphertext.encrypt(10 + i, (0x100 + i) % S, EncryptionKey(d))
             for i, d in enumerate(decoys)],
            Ciphertext.encrypt(current, 0x71, ek_sender),
            Ciphertext.encrypt(55, 0x72, ek_recipient),
        )
        out.append(dict(
            amount=amount, remaining_balance=remaining,
            s_index=s_index, t_index=t_index, dec_key=dec_key.fs,
            randomness=randomness, alpha=alpha, enc_keys=enc_keys,
            left_ciphertexts=lcs,
            enc_balances=[(b.left, b.right) for b in balances],
            pgk=pgk.point, g_epoch=g_epoch,
        ))
    return out
