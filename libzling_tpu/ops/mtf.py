"""Device-side sticky move-to-front relabeling.

The reference applies MTF inline, one literal at a time, inside the ROLZ
loops (src/libzling_lz.cpp:112-126,188,333).  MTF state is the one
cross-block dependency of the format (SURVEY.md section 0.3): the 256
per-context permutations persist for the whole stream.

Tokenization does not depend on MTF *values*, so the encoder here emits raw
literal bytes and this op relabels them afterwards.  The 256 context chains
are mutually independent, which gives the parallel formulation: stable-sort
the literal stream by context, then run one scan where each of the 256
contexts advances through its own run in lockstep (jnp gathers/scatters over
the [256, 256] permutation state).  Step count is the longest per-context
run instead of the total literal count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import MTF_INIT, MTF_NEXT

_NP_MTF_NEXT = np.asarray(MTF_NEXT, dtype=np.int32)


def _J_MTF_NEXT():
    # lazy so importing never initializes a device backend
    return jnp.asarray(_NP_MTF_NEXT)


def initial_state() -> tuple[jnp.ndarray, jnp.ndarray]:
    """(rank2sym, sym2rank), each [256 contexts, 256], int32."""
    r2s = np.tile(MTF_INIT[None, :], (256, 1)).astype(np.int32)
    s2r = np.zeros((256, 256), np.int32)
    s2r[np.arange(256)[:, None], r2s] = np.arange(256)[None, :]
    return jnp.asarray(r2s), jnp.asarray(s2r)


@jax.jit
def encode_relabel(rank2sym, sym2rank, lit_ctx, lit_raw, lit_valid):
    """Relabel raw literal bytes to MTF ranks, in stream order.

    lit_ctx/lit_raw/lit_valid: [L] (padded).  Returns (ranks [L], rank2sym',
    sym2rank').  Mirrors ZlingMTFEncoder::Encode (src/libzling_lz.cpp:112-117)
    per context: i = rank(c); swap ranks i and MTF_NEXT[i].
    """
    L = lit_ctx.shape[0]
    lit_ctx = lit_ctx.astype(jnp.int32)
    lit_raw = lit_raw.astype(jnp.int32)

    # stable sort by context; each context's literals stay in stream order
    order = jnp.argsort(jnp.where(lit_valid, lit_ctx, 256), stable=True)
    ctx_s = lit_ctx[order]
    raw_s = lit_raw[order]
    valid_s = lit_valid[order]
    # per-context run boundaries
    counts = jnp.zeros(257, jnp.int32).at[jnp.where(lit_valid, lit_ctx, 256)].add(1)
    run_start = jnp.cumsum(counts[:256]) - counts[:256]  # [256]
    run_len = counts[:256]
    max_run = jnp.max(run_len)

    ranks_s = jnp.zeros(L, jnp.int32)
    ctxs = jnp.arange(256, dtype=jnp.int32)

    def body(carry):
        k, r2s, s2r, out = carry
        pos = run_start + k                       # [256]
        active = k < run_len
        idx = jnp.where(active, pos, L)           # OOB -> dropped
        sym = raw_s[jnp.clip(idx, 0, L - 1)]      # k-th literal per context
        i = s2r[ctxs, sym]                        # current rank of symbol
        j = _J_MTF_NEXT()[i]
        other = r2s[ctxs, j]                      # symbol currently at rank j
        # masked swaps via OOB-drop scatters
        c_w = jnp.where(active, ctxs, 256)
        r2s = r2s.at[c_w, i].set(other, mode="drop")
        r2s = r2s.at[c_w, j].set(sym, mode="drop")
        s2r = s2r.at[c_w, sym].set(j, mode="drop")
        s2r = s2r.at[c_w, other].set(i, mode="drop")
        out = out.at[idx].set(i, mode="drop")
        return k + 1, r2s, s2r, out

    def cond(carry):
        return carry[0] < max_run

    _, r2s, s2r, ranks_s = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rank2sym, sym2rank, ranks_s))

    # scatter back to stream order
    ranks = jnp.zeros(L, jnp.int32).at[order].set(ranks_s)
    ranks = jnp.where(lit_valid, ranks, 0)
    return ranks, r2s, s2r


def encode_relabel_reference(rank2sym, sym2rank, lit_ctx, lit_raw):
    """NumPy oracle for tests: sequential per-literal relabel."""
    r2s = np.array(rank2sym)
    s2r = np.array(sym2rank)
    nxt = np.asarray(MTF_NEXT)
    out = np.zeros(len(lit_ctx), np.int32)
    for t, (c, sym) in enumerate(zip(lit_ctx, lit_raw)):
        i = s2r[c, sym]
        j = nxt[i]
        other = r2s[c, j]
        s2r[c, sym], s2r[c, other] = j, i
        r2s[c, i], r2s[c, j] = other, sym
        out[t] = i
    return out, r2s, s2r
