"""Compiled batched witness synthesis for the ConfidentialTransfer circuit.

The reference re-interprets the circuit per proof (bellman ConstraintSystem
trait calls); here the circuit is fixed, so witness generation is a static
JAX graph: bit decompositions and window lookups are gathers, the
scalar-mul chains run inversion-free in extended Edwards coordinates as
lax.scans, and affine gadget values are recovered with a handful of batched
Montgomery inversions.  Aux values are emitted in EXACTLY the allocation
order of models/confidential.py (validated against the Python synthesis in
tests/test_tpu_witness.py).

Everything is batched over a trailing proof axis B.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import jubjub as ej
from ..ff import limbs as L
from ..mirror import jubjub as mjj
from ..mirror.field import R

FR = L.FR

mul = partial(L.mont_mul, FR)
fadd = partial(L.add, FR)
fsub = partial(L.sub, FR)

ONE_MONT_LIMBS = np.asarray(
    L._int_to_limbs(FR.r_mod_p, FR.n), dtype=np.int32
)
D_MONT_LIMBS = np.asarray(
    L._int_to_limbs(mjj.EDWARDS_D * FR.r_mod_p % R, FR.n), dtype=np.int32
)


def _const(limbs_np, ndim):
    return jnp.asarray(limbs_np).reshape((FR.n,) + (1,) * (ndim - 1))


def _table_mont() -> tuple[np.ndarray, np.ndarray]:
    """Fixed-base window tables (gen NoteCommitmentRandomness):
    x/y arrays (n_limbs, 84, 8) in Montgomery form."""
    windows = mjj.fixed_base_circuit_generators(mjj.NOTE_COMMITMENT_RANDOMNESS)
    tx = np.zeros((FR.n, 84, 8), dtype=np.int32)
    ty = np.zeros((FR.n, 84, 8), dtype=np.int32)
    for w, coords in enumerate(windows):
        for k, (x, y) in enumerate(coords):
            tx[:, w, k] = L._int_to_limbs(x * FR.r_mod_p % R, FR.n)
            ty[:, w, k] = L._int_to_limbs(y * FR.r_mod_p % R, FR.n)
    return tx, ty


TABLE_X, TABLE_Y = _table_mont()


def bit_mont(bits):
    """(k, B) 0/1 int32 -> (n_limbs, k, B) Montgomery limb array."""
    one = jnp.asarray(ONE_MONT_LIMBS).reshape(FR.n, 1, 1)
    return one * bits[None].astype(jnp.int32)


def u32_to_mont(v):
    """(B,) int32 (< 2^32, from two u16 halves to avoid sign issues) ->
    (n_limbs, B) Montgomery."""
    v = v.astype(jnp.uint32)
    limbs = jnp.stack(
        [
            (v & 0xFFF).astype(jnp.int32),
            ((v >> 12) & 0xFFF).astype(jnp.int32),
            ((v >> 24) & 0xFF).astype(jnp.int32),
        ]
        + [jnp.zeros_like(v, dtype=jnp.int32)] * (FR.n - 3),
        axis=0,
    )
    return L.to_mont(FR, limbs)


# ---------------------------------------------------------------- gadget math
def _dconst(like):
    return jnp.broadcast_to(_const(D_MONT_LIMBS, like.ndim), like.shape)


def _affine_dbl_aux(x, y):
    """T, A, C for a doubling gadget from the INPUT affine point."""
    t = mul(fadd(x, y), fadd(x, y))
    a = mul(x, y)
    c = mul(mul(_dconst(a), a), a)
    return t, a, c


def _affine_add_aux(x1, y1, x2, y2):
    """U, A, B, C for an addition gadget from the two affine inputs."""
    u = mul(fadd(x1, y1), fadd(x2, y2))
    a = mul(y2, x1)
    b = mul(x2, y1)
    c = mul(mul(_dconst(a), a), b)
    return u, a, b, c


def _ext_from_affine(x, y):
    one = jnp.broadcast_to(_const(ONE_MONT_LIMBS, x.ndim), x.shape)
    return (x, y, one, mul(x, y))


class Emitter:
    """Collects aux blocks (n_limbs, k, B) in allocation order."""

    def __init__(self):
        self.blocks = []

    def emit(self, arr):
        if arr.ndim == 2:
            arr = arr[:, None, :]
        self.blocks.append(arr)

    def concat(self):
        return jnp.concatenate(self.blocks, axis=1)


def emit_u32_range(em: Emitter, value):
    """range_check.rs layout: num, 31 BE run bits, 30 ANDs, bit 31.

    Returns LE bits (32, B)."""
    bits_le = jnp.stack(
        [(value >> i) & 1 for i in range(32)], axis=0
    ).astype(jnp.int32)
    em.emit(u32_to_mont(value))
    bits_be = bits_le[::-1]
    em.emit(bit_mont(bits_be[:31]))
    ands = jnp.cumprod(bits_be[:31], axis=0)[1:]  # and-chain of the ones run
    em.emit(bit_mont(ands))
    em.emit(bit_mont(bits_be[31:32]))
    return bits_le


def emit_field_bits(em: Emitter, bits):
    em.emit(bit_mont(bits))


def fixed_base_digits(bits, n_windows=84):
    """(n, B) bits -> (n_windows, B) 3-bit digits (zero-padded)."""
    n, B = bits.shape
    pad = n_windows * 3 - n
    b = jnp.concatenate([bits, jnp.zeros((pad, B), bits.dtype)], axis=0)
    b = b.reshape(n_windows, 3, B)
    return b[:, 0] + 2 * b[:, 1] + 4 * b[:, 2]


def compute_fixed_base_chains(bits_list):
    """Run all fixed-base chains together.

    bits_list: list of (n_i, B) bit arrays (same generator).  Returns per
    chain: dict with lookup affines, precomp bits, chain result affines.
    """
    B = bits_list[0].shape[1]
    n_chains = len(bits_list)
    digits = jnp.stack(
        [fixed_base_digits(b) for b in bits_list], axis=1
    )  # (84, n_chains, B)

    tx = jnp.asarray(TABLE_X)  # (L, 84, 8)
    ty = jnp.asarray(TABLE_Y)

    # lookups: gather per window
    def gather(tab):  # -> (L, 84, n_chains, B)
        return jnp.take_along_axis(
            tab[:, :, None, None, :],  # (L, 84, 1, 1, 8)
            digits[None, :, :, :, None].astype(jnp.int32),
            axis=-1,
        )[..., 0]

    lx = gather(tx)
    ly = gather(ty)

    # chain of additions over windows (extended coords)
    def step(carry, xs):
        lx_w, ly_w = xs
        new = ej.add(carry, _ext_from_affine(lx_w, ly_w))
        return new, new

    init = _ext_from_affine(lx[:, 0], ly[:, 0])
    _, results = jax.lax.scan(
        step, init, (jnp.moveaxis(lx[:, 1:], 1, 0), jnp.moveaxis(ly[:, 1:], 1, 0))
    )
    # results leaves: (83, L, n_chains, B); normalize all at once
    rx_all, ry_all = _normalize_stack(results)
    # (L, 83, n_chains, B)
    return {
        "digits": digits,
        "lookup_x": lx,
        "lookup_y": ly,
        "res_x": rx_all,
        "res_y": ry_all,
    }


def _normalize_stack(ext_stack):
    """scan-collected extended points (k, L, ...) -> affine (L, k, ...)."""
    X, Y, Z, T = ext_stack
    X = jnp.moveaxis(X, 0, 1)
    Y = jnp.moveaxis(Y, 0, 1)
    Z = jnp.moveaxis(Z, 0, 1)
    shape = Z.shape
    zinv = L.batch_inv_mont(FR, Z.reshape(FR.n, -1), axis=1).reshape(shape)
    return mul(X, zinv), mul(Y, zinv)


def emit_fixed_base(em: Emitter, chains, chain_idx: int, n_bits: int):
    """Emit lookup + addition aux for one fixed-base chain; returns the
    result affine (x, y)."""
    nw = -(-n_bits // 3)
    lx = chains["lookup_x"][:, :, chain_idx]  # (L, 84, B)
    ly = chains["lookup_y"][:, :, chain_idx]
    digits = chains["digits"][:, chain_idx]  # (84, B)
    rx = chains["res_x"][:, :, chain_idx]  # (L, 83, B)
    ry = chains["res_y"][:, :, chain_idx]

    # precomp bit values per window: bit1 & bit2 of the digit
    b1 = (digits >> 1) & 1
    b2 = (digits >> 2) & 1
    precomp = bit_mont((b1 & b2).astype(jnp.int32))  # (L, 84, B)

    full_windows = n_bits // 3  # windows with 3 real bits
    # window 0: x, y, precomp
    em.emit(jnp.stack([lx[:, 0], ly[:, 0], precomp[:, 0]], axis=1))

    # windows 1..nw-1: lookup(3) + addition(6)
    # addition w inputs: result affine of w-1 (res for w>=2, lookup0 for w=1)
    prev_x = jnp.concatenate([lx[:, 0:1], rx[:, : nw - 2]], axis=1)
    prev_y = jnp.concatenate([ly[:, 0:1], ry[:, : nw - 2]], axis=1)
    cur_lx = lx[:, 1:nw]
    cur_ly = ly[:, 1:nw]
    u, a, b, c = _affine_add_aux(prev_x, prev_y, cur_lx, cur_ly)
    x3 = rx[:, : nw - 1]
    y3 = ry[:, : nw - 1]

    def win_block(w):
        parts = [cur_lx[:, w], cur_ly[:, w]]
        if w + 1 < full_windows:  # window w+1 has a real precomp bit
            parts.append(precomp[:, w + 1])
        parts += [u[:, w], a[:, w], b[:, w], c[:, w], x3[:, w], y3[:, w]]
        return jnp.stack(parts, axis=1)

    if full_windows >= nw:  # all windows full (252-bit scalars)
        block = jnp.stack(
            [cur_lx, cur_ly, precomp[:, 1:nw], u, a, b, c, x3, y3], axis=2
        )  # (L, nw-1, 9, B)
        em.emit(block.reshape(FR.n, (nw - 1) * 9, block.shape[-1]))
    else:
        for w in range(nw - 1):
            em.emit(win_block(w))

    return rx[:, nw - 2], ry[:, nw - 2]


def compute_var_mul_chains(bases, bits):
    """bases: affine (x, y) each (L, n_chains, B); bits (252, n_chains, B).

    Returns dict of affine arrays for curbase doublings, selections, and
    addition results."""
    base_ext = _ext_from_affine(*bases)

    def step(carry, bit):
        cur, res = carry
        sel = ej.select(bit.astype(bool), cur, ej.identity(bit.shape))
        res_new = ej.add(res, sel)  # identity + sel == sel projectively
        out = (cur, res_new)
        cur_next = ej.double(cur)
        return (cur_next, res_new), out

    init = (base_ext, ej.identity(bits.shape[1:]))
    _, (curs, results) = jax.lax.scan(step, init, bits)
    # curs: extended stacks (252, L, C, B); curs[i] is curbase at step i
    cur_x, cur_y = _normalize_stack(curs)
    res_x, res_y = _normalize_stack(results)
    return {
        "cur_x": cur_x,  # (L, 252, C, B)
        "cur_y": cur_y,
        "res_x": res_x,
        "res_y": res_y,
    }


def emit_var_mul(em: Emitter, chains, bits, chain_idx: int):
    """Emit doubling/selection/addition aux for one variable-base mul.

    bits: (252, B) for this chain.  Returns result affine (x, y)."""
    cx = chains["cur_x"][:, :, chain_idx]  # (L, 252, B)
    cy = chains["cur_y"][:, :, chain_idx]
    rx = chains["res_x"][:, :, chain_idx]
    ry = chains["res_y"][:, :, chain_idx]
    nb = bits.shape[0]

    one = jnp.broadcast_to(_const(ONE_MONT_LIMBS, cx.ndim), cx.shape)
    selx = jnp.where(bits[None].astype(bool), cx, jnp.zeros_like(cx))
    sely = jnp.where(bits[None].astype(bool), cy, one)

    # selection 0 aux
    em.emit(jnp.stack([selx[:, 0], sely[:, 0]], axis=1))

    # steps 1..251: doubling(T,A,C,x3,y3), selection(x',y'), addition(6)
    t, a, c = _affine_dbl_aux(cx[:, : nb - 1], cy[:, : nb - 1])
    dx3 = cx[:, 1:]
    dy3 = cy[:, 1:]
    u, aa, bb, cc = _affine_add_aux(
        rx[:, : nb - 1], ry[:, : nb - 1], selx[:, 1:], sely[:, 1:]
    )
    block = jnp.stack(
        [
            t, a, c, dx3, dy3,
            selx[:, 1:], sely[:, 1:],
            u, aa, bb, cc, rx[:, 1:], ry[:, 1:],
        ],
        axis=2,
    )  # (L, 251, 13, B)
    em.emit(block.reshape(FR.n, (nb - 1) * 13, block.shape[-1]))
    return rx[:, nb - 1], ry[:, nb - 1]


def emit_witness_point(em: Emitter, x, y):
    """EdwardsPoint::witness aux: x, y, x^2, y^2, x^2y^2."""
    x2 = mul(x, x)
    y2 = mul(y, y)
    x2y2 = mul(x2, y2)
    em.emit(jnp.stack([x, y, x2, y2, x2y2], axis=1))
    return x, y


def emit_add_gadget(em: Emitter, x1, y1, x2, y2):
    """Standalone EdwardsPoint::add: U, A, B, C, x3, y3 (affine math)."""
    u, a, b, c = _affine_add_aux(x1, y1, x2, y2)
    # x3 = (A+B)/(1+C), y3 = (U-A-B)/(1-C): done via extended add + normalize
    ext = ej.add(_ext_from_affine(x1, y1), _ext_from_affine(x2, y2))
    zinv = L.batch_inv_mont(
        FR, ext[2].reshape(FR.n, -1), axis=1
    ).reshape(ext[2].shape)
    x3 = mul(ext[0], zinv)
    y3 = mul(ext[1], zinv)
    em.emit(jnp.stack([u, a, b, c, x3, y3], axis=1))
    return x3, y3


def emit_not_small_order(em: Emitter, x, y):
    """3 doublings (5 aux each) + ephemeral inverse of the final x."""
    cur = _ext_from_affine(x, y)
    outs = []
    for _ in range(3):
        nxt = ej.double(cur)
        outs.append(nxt)
        cur = nxt
    zs = jnp.stack([o[2] for o in outs], axis=1)  # (L, 3, B)
    zinv = L.batch_inv_mont(
        FR, zs.reshape(FR.n, -1), axis=1
    ).reshape(zs.shape)
    ax = mul(jnp.stack([o[0] for o in outs], axis=1), zinv)
    ay = mul(jnp.stack([o[1] for o in outs], axis=1), zinv)

    in_x = jnp.concatenate([x[:, None], ax[:, :2]], axis=1)
    in_y = jnp.concatenate([y[:, None], ay[:, :2]], axis=1)
    t, a, c = _affine_dbl_aux(in_x, in_y)
    block = jnp.stack([t, a, c, ax, ay], axis=2)  # (L, 3, 5, B)
    em.emit(block.reshape(FR.n, 15, block.shape[-1]))

    # ephemeral inverse of the third doubling's x (num::assert_nonzero)
    inv = L.batch_inv_mont(
        FR, ax[:, 2].reshape(FR.n, -1), axis=1
    ).reshape(x.shape)
    em.emit(inv)


# ======================================================================
# full ConfidentialTransfer witness assembly
# ======================================================================

def confidential_witness(
    amount_u32,          # (B,) uint32
    remaining_u32,       # (B,) uint32
    fee_u32,             # (B,) uint32
    dec_key_bits,        # (252, B) 0/1
    randomness_bits,     # (252, B)
    alpha_bits,          # (252, B)
    ekr,                 # enc_key_recipient affine mont: (x, y) each (L, B)
    ebl,                 # enc_balance_left
    ebr,                 # enc_balance_right
    pgk,                 # proof generation key
    gep,                 # g_epoch
):
    """-> (aux (L, n_aux, B), public (L, 23, B)), both Montgomery limbs.

    Aux order matches models/confidential.py allocation order exactly."""
    em = Emitter()
    B = dec_key_bits.shape[1]

    amount_bits = emit_u32_range(em, amount_u32)
    remaining_bits = emit_u32_range(em, remaining_u32)
    fee_bits = emit_u32_range(em, fee_u32)
    emit_field_bits(em, dec_key_bits)

    # ---- fixed-base group (all on NoteCommitmentRandomness) ----------
    fb = compute_fixed_base_chains(
        [
            dec_key_bits,                         # 0: enc_key_sender
            amount_bits,                          # 1: amount_g
            fee_bits,                             # 2: fee_g
            randomness_bits,                      # 3: c_right
            remaining_bits,                       # 4: rem_bal_g
            alpha_bits,                           # 5: alpha_g
        ]
    )

    eks = emit_fixed_base(em, fb, 0, 252)          # enc_key_sender
    # (inputize enc_key_sender: no aux)
    amount_g = emit_fixed_base(em, fb, 1, 32)
    fee_g = emit_fixed_base(em, fb, 2, 32)
    emit_field_bits(em, randomness_bits)

    # ---- variable-base group (bases now known) -----------------------
    # c_right result is needed as a var-mul base: compute from chain 3
    nw252 = 84
    c_right = (fb["res_x"][:, nw252 - 2, 3], fb["res_y"][:, nw252 - 2, 3])

    vm_bases = (
        jnp.stack([eks[0], ekr[0], c_right[0], ebr[0], gep[0]], axis=1),
        jnp.stack([eks[1], ekr[1], c_right[1], ebr[1], gep[1]], axis=1),
    )
    vm_bits = jnp.stack(
        [
            randomness_bits,   # 0: val_rls = eks * randomness
            randomness_bits,   # 1: val_rlr = ekr * randomness
            dec_key_bits,      # 2: dec_key_sender_random = c_right * dk
            dec_key_bits,      # 3: dec_key_sender_pointr = ebr * dk
            dec_key_bits,      # 4: nonce = g_epoch * dk
        ],
        axis=1,
    )  # (252, 5, B)
    vm = compute_var_mul_chains(vm_bases, vm_bits)

    val_rls = emit_var_mul(em, vm, vm_bits[:, 0], 0)

    ekr_w = emit_witness_point(em, ekr[0], ekr[1])
    emit_not_small_order(em, ekr[0], ekr[1])

    val_rlr = emit_var_mul(em, vm, vm_bits[:, 1], 1)
    # (inputize enc_key_recipient)

    c_left_sender = emit_add_gadget(em, *amount_g, *val_rls)
    c_left_recipient = emit_add_gadget(em, *amount_g, *val_rlr)
    c_right_res = emit_fixed_base(em, fb, 3, 252)
    f_left_sender = emit_add_gadget(em, *fee_g, *val_rls)
    # (inputize x4)

    emit_witness_point(em, ebl[0], ebl[1])
    emit_witness_point(em, ebr[0], ebr[1])
    emit_not_small_order(em, ebl[0], ebl[1])
    emit_not_small_order(em, ebr[0], ebr[1])

    dksr = emit_var_mul(em, vm, vm_bits[:, 2], 2)
    bal_dksr = emit_add_gadget(em, ebl[0], ebl[1], *dksr)
    bi_left = emit_add_gadget(em, *bal_dksr, *dksr)

    dksp = emit_var_mul(em, vm, vm_bits[:, 3], 3)
    rem_bal_g = emit_fixed_base(em, fb, 4, 32)
    val_rem_bal = emit_add_gadget(em, *c_left_sender, *rem_bal_g)
    val_rem_bal_balr = emit_add_gadget(em, *val_rem_bal, *dksp)
    bi_right = emit_add_gadget(em, *f_left_sender, *val_rem_bal_balr)
    # (eq points, inputize enc_balance_left/right: no aux)

    # ---- rvk ----------------------------------------------------------
    emit_witness_point(em, pgk[0], pgk[1])
    emit_not_small_order(em, pgk[0], pgk[1])
    emit_field_bits(em, alpha_bits)
    alpha_g = emit_fixed_base(em, fb, 5, 252)
    rvk = emit_add_gadget(em, pgk[0], pgk[1], *alpha_g)
    emit_not_small_order(em, *rvk)
    # (inputize rvk)

    # ---- g_epoch / nonce ---------------------------------------------
    emit_witness_point(em, gep[0], gep[1])
    nonce = emit_var_mul(em, vm, vm_bits[:, 4], 4)
    # (inputize g_epoch, nonce)

    aux = em.concat()

    one = jnp.broadcast_to(
        _const(ONE_MONT_LIMBS, 2), (FR.n, B)
    )
    public = jnp.stack(
        [
            one,
            eks[0], eks[1],
            ekr[0], ekr[1],
            c_left_sender[0], c_left_sender[1],
            c_left_recipient[0], c_left_recipient[1],
            c_right_res[0], c_right_res[1],
            f_left_sender[0], f_left_sender[1],
            ebl[0], ebl[1],
            ebr[0], ebr[1],
            rvk[0], rvk[1],
            gep[0], gep[1],
            nonce[0], nonce[1],
        ],
        axis=1,
    )
    return aux, public


def _maybe_forced(fn):
    """Trace the witness graph with every field op routed to the fused
    Pallas kernels (ZEROCHAIN_WITNESS_PALLAS=0 restores the composed
    path).  The witness scans run thousands of small-width Fr ops in
    sequence; composed carry-scan graphs execute them at ~60us apiece on
    the tunneled worker, fused kernel calls at a fraction of that.
    No-op off-TPU (forced() keeps the composed path there)."""
    import os as _os

    def wrapped(*args, **kwargs):
        if _os.environ.get("ZEROCHAIN_WITNESS_PALLAS", "1") == "0":
            return fn(*args, **kwargs)
        from ..ff import pallas_ff as PF

        with PF.forced():
            return fn(*args, **kwargs)

    return wrapped


confidential_witness_jit = jax.jit(_maybe_forced(confidential_witness))


# ---------------------------------------------------------------- host API
def bits_le_host(values, n_bits):
    from ..native.codec import scalars_to_bits_np

    return jnp.asarray(scalars_to_bits_np(list(values), n_bits))


def affine_mont_host(points):
    """[(x, y), ...] host ints -> (x_limbs, y_limbs) each (L, B) mont."""
    xs = L.to_limbs(FR, [p[0] for p in points], mont=True)
    ys = L.to_limbs(FR, [p[1] for p in points], mont=True)
    return xs, ys


def witness_inputs_host(assignments: list[dict]):
    """Build device inputs from a list of per-proof witness dicts with keys:
    amount, remaining_balance, fee (ints); dec_key, randomness, alpha (Fs
    ints); enc_key_recipient, encrypted_balance (left/right), pgk, g_epoch
    (affine int points)."""
    import numpy as _np

    B = len(assignments)
    get = lambda k: [a[k] for a in assignments]
    return dict(
        amount_u32=jnp.asarray(_np.array(get("amount"), dtype=_np.uint32)),
        remaining_u32=jnp.asarray(
            _np.array(get("remaining_balance"), dtype=_np.uint32)
        ),
        fee_u32=jnp.asarray(_np.array(get("fee"), dtype=_np.uint32)),
        dec_key_bits=bits_le_host(get("dec_key"), 252),
        randomness_bits=bits_le_host(get("randomness"), 252),
        alpha_bits=bits_le_host(get("alpha"), 252),
        ekr=affine_mont_host(get("enc_key_recipient")),
        ebl=affine_mont_host(get("enc_balance_left")),
        ebr=affine_mont_host(get("enc_balance_right")),
        pgk=affine_mont_host(get("pgk")),
        gep=affine_mont_host(get("g_epoch")),
    )
