"""Marker-stream (Parabix-style) matcher for the RESTRICTED from-header
form — the ROADMAP #6 probe's subject.

Compiles the REGEX structure (not the DFA) to bitstream ops on the packed
plane domain [L_pad, NW] (bit i of word w = string w*32+i at that
position... the raw pack_bool/pack_bytes mapping):

    (^|\r\n) "from:" NAME+ "@" DOM+ "\r\n"   anchored at end of string

  - byte-class streams from the 8 byte-bit planes (shared Shannon BDD)
  - literal "from:" via a shift-AND cascade gated on line starts
  - NAME+/DOM+ runs via two affine set/reset span scans (log2 L rounds)
  - the end anchor via the enable boundary

This is the FAVORABLE case for marker streams (no per-position state
reconstruction, two spans only); the probe measures it against the full
DFA scan kernel to bound what regex->bitstream compilation could buy on
this layout.  Correctness: match_ok is checked bit-exactly against
Python `re` on every corpus the probe uses.
"""

from __future__ import annotations

import numpy as np

from halo2_regex_tpu.compiler.bitslice import (
    Builder,
    byte_set_expr,
    linearize,
)

NAME_BYTES = [ord(c) for c in
              "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
              "0123456789.-"]
DOM_BYTES = NAME_BYTES

PY_PATTERN = (
    rb"(?:\A|\r\n)from:[A-Za-z0-9.\-]+@[A-Za-z0-9.\-]+\r\n\Z"
)


def build_class_prog():
    """Straight-line program: byte_bit{0..7} planes -> class planes for
    f r o m : @ \r \n NAME DOM."""
    b = Builder()
    outs = {}
    for name, byts in (
        ("f", [ord("f")]),
        ("r", [ord("r")]),
        ("o", [ord("o")]),
        ("m", [ord("m")]),
        ("colon", [ord(":")]),
        ("at", [ord("@")]),
        ("cr", [13]),
        ("lf", [10]),
        ("name", NAME_BYTES),
        ("dom", DOM_BYTES),
    ):
        outs[name] = byte_set_expr(b, byts)
    return linearize(b, outs)


CLASS_PROG = build_class_prog()


def marker_match(planes, en_plane, end_plane, jnp):
    """The marker program.  ``planes``: list of 8 byte-bit planes
    [L_pad, NW]; ``en_plane``: enable; ``end_plane``: bit set at the last
    enabled position of each string (the end anchor).  Returns the
    match_ok plane [NW] (bitmask over strings).

    Pass ``numpy`` or ``jax.numpy`` as ``jnp``.
    """
    L = planes[0].shape[0]
    env = {f"byte_bit{j}": planes[j] for j in range(8)}
    cls = CLASS_PROG.run(env)
    c = {k: v & en_plane for k, v in cls.items()}

    def shift_down(p, n=1):  # p[i] := p[i-n]
        z = jnp.zeros((n,) + p.shape[1:], p.dtype)
        return jnp.concatenate([z, p[: L - n]], axis=0)

    # line starts: position 0, or right after \r\n
    linestart = jnp.zeros_like(en_plane)
    if hasattr(linestart, "at"):
        linestart = linestart.at[0].set(-1)
    else:
        linestart = linestart.copy()
        linestart[0] = -1
    linestart = linestart | (shift_down(c["cr"], 2) & shift_down(c["lf"], 1))

    # "from:" shift-AND cascade anchored at line starts
    k = linestart & c["f"]
    for nm in ("r", "o", "m", "colon"):
        k = shift_down(k) & c[nm]
    from_end = shift_down(k)  # marker at the first NAME position

    # NAME+ run span: x' = name·x + (from_end & name)
    a1 = c["name"]
    b1 = from_end & c["name"]
    ns = _affine_scan(a1, b1, jnp)

    # DOM+ run span after a name-terminated '@'
    at_ok = c["at"] & shift_down(ns)
    a2 = c["dom"]
    b2 = shift_down(at_ok) & c["dom"]
    ds = _affine_scan(a2, b2, jnp)

    # "\r\n" right after the domain, at the string end
    tail = shift_down(ds, 1) & c["cr"]
    done = shift_down(tail, 1) & c["lf"] & end_plane
    # OR-reduce over positions -> per-string bit
    out = done[0]
    for i in range(1, L):
        out = out | done[i]
    return out


def _affine_scan(a, b, jnp):
    """Inclusive scan of x' = a·x + b along axis 0 (log2 rounds)."""
    L = a.shape[0]
    shift = 1
    while shift < L:
        ones = jnp.full((shift,) + a.shape[1:], -1, a.dtype)
        zeros = jnp.zeros((shift,) + b.shape[1:], b.dtype)
        a_prev = jnp.concatenate([ones, a[: L - shift]], axis=0)
        b_prev = jnp.concatenate([zeros, b[: L - shift]], axis=0)
        a, b = a_prev & a, (a & b_prev) | b
        shift *= 2
    return b


def marker_match_reduced(planes, en_plane, end_plane, jnp):
    """Same, but with a log-tree OR reduction at the end (for jit)."""
    L = planes[0].shape[0]
    env = {f"byte_bit{j}": planes[j] for j in range(8)}
    cls = CLASS_PROG.run(env)
    c = {k: v & en_plane for k, v in cls.items()}

    def shift_down(p, n=1):
        z = jnp.zeros((n,) + p.shape[1:], p.dtype)
        return jnp.concatenate([z, p[: L - n]], axis=0)

    first = jnp.concatenate(
        [jnp.full((1,) + en_plane.shape[1:], -1, en_plane.dtype),
         jnp.zeros((L - 1,) + en_plane.shape[1:], en_plane.dtype)], axis=0
    )
    linestart = first | (shift_down(c["cr"], 2) & shift_down(c["lf"], 1))
    k = linestart & c["f"]
    for nm in ("r", "o", "m", "colon"):
        k = shift_down(k) & c[nm]
    from_end = shift_down(k)
    ns = _affine_scan(c["name"], from_end & c["name"], jnp)
    at_ok = c["at"] & shift_down(ns)
    ds = _affine_scan(c["dom"], shift_down(at_ok) & c["dom"], jnp)
    tail = shift_down(ds, 1) & c["cr"]
    done = shift_down(tail, 1) & c["lf"] & end_plane
    # tree OR over axis 0
    x = done
    n = L
    while n > 1:
        half = n // 2
        x = x[:half] | x[half : 2 * half] if n % 2 == 0 else jnp.concatenate(
            [x[:half] | x[half : 2 * half], x[2 * half :]], axis=0
        )
        n = x.shape[0]
    return x[0]
