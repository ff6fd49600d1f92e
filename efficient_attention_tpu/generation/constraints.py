"""Lexically constrained decoding: static-shape constraint tracking + DBA.

TPU-native rebuild of fairseq's ``LexicallyConstrainedBeamSearch``
(``fairseq/search.py:210-527``) and ``UnorderedConstraintState``
(``fairseq/token_generation_constraints.py:202-350``) — Post & Vilar
(NAACL 2018) dynamic beam allocation with the Hu et al. (NAACL 2019)
improvements.

Fairseq tracks each hypothesis's progress with a dynamically allocated
token *trie* of host-side Python objects, rebuilt/reordered every decode
step — impossible under ``jit``.  Here the state is a fixed-shape pytree
carried through the decode loop: each constraint row gets an independent
matching automaton,

  * ``pos[i]`` — length of the constraint-``i`` prefix matched by the
    current suffix of the hypothesis,
  * ``met[i]`` — constraint ``i`` has been fully generated.

``bank`` — the DBA sort key — is the number of constraint *tokens*
generated: tokens of met constraints plus the deepest live prefix (the
trie-depth analogue, ``token_generation_constraints.py:258-259``).

Semantics deltas vs the reference trie (both documented, both benign):

  * the per-row automata recognize *overlapping* matches the single-node
    trie misses (constraints ``[[a b c], [b d]]`` on output ``a b d``:
    the ``b`` inside the dead ``a b`` prefix also starts ``b d``) — this
    matcher is strictly more complete;
  * duplicate constraint rows still require distinct occurrences (the
    ``Counter`` bookkeeping): when one occurrence completes, only the
    lowest-index unmet duplicate is marked met and the rest restart.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1e9


class ConstraintState(NamedTuple):
    """Per-hypothesis constraint progress; leading dims are free."""

    pos: Array  # [..., NC] int32 — matched prefix length per constraint
    met: Array  # [..., NC] bool — constraint fully generated


def constraint_lengths(cons: Array, pad: int) -> Array:
    """[..., NC] lengths of pad-padded constraint rows ``[..., NC, CL]``."""
    return jnp.sum(cons != pad, axis=-1).astype(jnp.int32)


def init_state(batch: int, beams: int, num_cons: int) -> ConstraintState:
    return ConstraintState(
        pos=jnp.zeros((batch, beams, num_cons), jnp.int32),
        met=jnp.zeros((batch, beams, num_cons), bool),
    )


def _dup_matrix(cons: Array, lens: Array) -> Array:
    """[B, NC, NC] — rows i, j are identical non-empty constraints."""
    eq = jnp.all(cons[:, :, None, :] == cons[:, None, :, :], axis=-1)
    nonempty = lens > 0
    return eq & nonempty[:, :, None] & nonempty[:, None, :]


def expected_tokens(cons: Array, state: ConstraintState) -> Array:
    """Next token advancing each constraint: ``cons[b, i, pos[b, ..., i]]``.

    cons ``[B, NC, CL]``; state fields ``[B, X, NC]`` → ``[B, X, NC]``.
    (For met rows the value is meaningless — mask with ``state.met``.)
    """
    CL = cons.shape[-1]
    idx = jnp.minimum(state.pos, CL - 1)
    return jnp.take_along_axis(cons[:, None], idx[..., None], axis=-1)[..., 0]


def advance(cons: Array, lens: Array, state: ConstraintState,
            token: Array) -> ConstraintState:
    """Advance every row's automaton with ``token`` ``[B, X]``.

    Mirrors ``UnorderedConstraintState.advance``: match → descend; mismatch
    → rewind to root and retry (``token_generation_constraints.py:298-350``);
    completion marks exactly one unmet duplicate row as met.
    """
    lens_b = lens[:, None]                                   # [B, 1, NC]
    exp = expected_tokens(cons, state)
    # lens guard: empty (all-pad) rows must never match — their "expected
    # token" is the pad filler itself
    match = (exp == token[..., None]) & ~state.met & (lens_b > 0)
    first = (cons[:, None, :, 0] == token[..., None]) & (lens_b > 0)
    new_pos = jnp.where(match, state.pos + 1,
                        jnp.where(first, 1, 0))
    completing = ~state.met & (new_pos >= lens_b) & (lens_b > 0)
    # duplicate rows complete simultaneously; award the occurrence to the
    # lowest-index one only (fairseq's generated-Counter semantics)
    dup = _dup_matrix(cons, lens)                            # [B, NC, NC]
    tri = jnp.tril(jnp.ones(dup.shape[-2:], bool), k=-1)     # j < i
    prior = jnp.einsum("bij,bxj->bxi", (dup & tri).astype(jnp.int32),
                       completing.astype(jnp.int32))
    allowed = completing & (prior == 0)
    met = state.met | allowed
    new_pos = jnp.where(completing | met, 0, new_pos)
    return ConstraintState(pos=new_pos, met=met)


def bank(lens: Array, state: ConstraintState) -> Array:
    """DBA bank ``[B, X]``: constraint tokens generated so far."""
    met_tokens = jnp.sum(jnp.where(state.met, lens[:, None], 0), axis=-1)
    live = jnp.max(jnp.where(state.met, 0, state.pos), axis=-1)
    return met_tokens + live


def finished(lens: Array, state: ConstraintState) -> Array:
    """[B, X] — every non-empty constraint met (may emit eos)."""
    return jnp.all(state.met | (lens[:, None] == 0), axis=-1)


def gather_state(state: ConstraintState, beam_idx: Array) -> ConstraintState:
    """Reorder ``[B, K, NC]`` state by per-batch beam indices ``[B, X]``."""
    take = lambda x: jnp.take_along_axis(x, beam_idx[..., None], axis=1)
    return ConstraintState(pos=take(state.pos), met=take(state.met))


def dba_select(cand: Array, state: ConstraintState, cons: Array,
               lens: Array, alive: Array, beam_size: int,
               ) -> Tuple[Array, Array, Array]:
    """One step of dynamically-bank-allocated candidate selection.

    Vectorized port of ``LexicallyConstrainedBeamSearch.step`` +
    ``step_sentence`` (``fairseq/search.py:263-527``): build the candidate
    list (top-2K global ∪ top-1 per beam ∪ every constraint-advancing
    token), dedup, sort by (bank desc, score desc), stripe round-robin
    across banks, take the best ``beam_size``.

    cand ``[B, K, V]`` cumulative scores (eos already masked by the
    caller); alive ``[B, K]`` marks real hypotheses (at step 0 only beam
    0).  Returns ``(scores, beam_idx, tok_idx)`` each ``[B, K]``.
    """
    B, K, V = cand.shape
    NC = cons.shape[1]

    def per_row(cand, pos, met, cons_r, lens_r, alive):
        st = ConstraintState(pos=pos, met=met)                # [K, NC]
        # --- candidate assembly (search.py:300-411) ---
        flat = cand.reshape(K * V)
        s_g, i_g = jax.lax.top_k(flat, 2 * K)                 # global top-2K
        b_g, t_g = i_g // V, i_g % V
        s_1, t_1 = jax.lax.top_k(cand, 1)                     # top-1 per beam
        b_1 = jnp.arange(K, dtype=t_1.dtype)
        nxt = expected_tokens(cons_r[None], ConstraintState(
            pos=pos[None], met=met[None]))[0]                 # [K, NC]
        c_valid = (~met) & (lens_r[None, :] > 0)              # [K, NC]
        s_c = jnp.take_along_axis(cand, nxt, axis=1)          # [K, NC]
        b_c = jnp.broadcast_to(jnp.arange(K)[:, None], (K, NC))

        beams = jnp.concatenate([b_g, b_1, b_c.reshape(-1)])
        toks = jnp.concatenate(
            [t_g, t_1.reshape(-1), nxt.reshape(-1)]).astype(jnp.int32)
        scores = jnp.concatenate([s_g, s_1.reshape(-1), s_c.reshape(-1)])
        valid = jnp.concatenate([
            jnp.ones(3 * K, bool), c_valid.reshape(-1)]) & alive[beams]
        n = beams.shape[0]

        # --- dedup identical (beam, token) pairs (search.py:452-476);
        # valid entries sort first within a key group so the survivor of a
        # duplicate pair is never an already-invalidated copy ---
        key = beams * (V + 1) + toks
        order = jnp.argsort(key * 2 + (~valid).astype(key.dtype))
        ks = key[order]
        dup_sorted = jnp.concatenate(
            [jnp.zeros((1,), bool), ks[1:] == ks[:-1]])
        dup = jnp.zeros((n,), bool).at[order].set(dup_sorted)
        valid = valid & ~dup

        # --- advance states, compute banks (search.py:425-429) ---
        st_c = ConstraintState(pos=pos[beams][None], met=met[beams][None])
        st_adv = advance(cons_r[None], lens_r[None], st_c, toks[None])
        banks = bank(lens_r[None], st_adv)[0]                 # [n]
        scores = jnp.where(valid, scores, NEG_INF)

        # --- sort by (bank desc, score desc): two stable argsorts ---
        o1 = jnp.argsort(-scores, stable=True)
        o2 = jnp.argsort(-banks[o1], stable=True)
        order = o1[o2]
        banks_s = banks[order]
        valid_s = valid[order]

        # --- stripe round-robin across banks (search.py:478-516) ---
        idx = jnp.arange(n)
        change = jnp.concatenate(
            [jnp.ones((1,), bool), banks_s[1:] != banks_s[:-1]])
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(change, idx, 0))
        rank = idx - seg_start
        max_bank = jnp.max(banks_s)
        # the rank multiplier must exceed the bank-deficit range (bounded
        # by max_bank, i.e. total constraint TOKENS — not by n), or a
        # rank-1 candidate of a deep bank outranks rank-0 candidates of
        # shallow banks and DBA degenerates to all-one-bank; fairseq's
        # fixed `len(banks) + 1` multiplier (search.py:496) has exactly
        # that overflow for constraints longer than the candidate list
        mult = max_bank + 1
        stripes = (max_bank - banks_s) + rank * mult
        stripes = jnp.where(valid_s, stripes, (n + 1) * mult + idx)
        o3 = jnp.argsort(stripes, stable=True)
        final = order[o3][:K]
        return scores[final], beams[final], toks[final]

    return jax.vmap(per_row)(cand, state.pos, state.met, cons, lens, alive)
