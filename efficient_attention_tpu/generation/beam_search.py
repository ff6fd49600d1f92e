"""Beam-search sequence generation with fixed-shape pytree decode state.

Replaces ``fairseq/sequence_generator.py`` (``SequenceGenerator._generate``,
``sequence_generator.py:191-569``) the TPU way: the whole beam loop is a
``lax.scan`` over decode steps with static shapes; incremental states
(softmax KV caches or causal-EVA window/chunk states) are pytrees reordered
by a batched gather — the analogue of ``reorder_incremental_state``
(``causal_eva.py:835-849``).

Supports beam search with length penalty (the MT recipe's ``--beam 4
--lenpen 0.6``, ``main.sh:170-172``), Diverse Beam Search, Diverse
Siblings, prefix-constrained decoding, lexically-constrained decoding
(Post & Vilar dynamic bank allocation — fixed-shape automata in
``generation/constraints.py`` replace fairseq's host-side constraint
tries, ``search.py:210-550``), n-gram repeat blocking, and
greedy/sampling as degenerate cases.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1e9


class BeamState(NamedTuple):
    tokens: Array          # [B, K, L] emitted tokens (starts with eos/bos)
    log_probs: Array       # [B, K] cumulative alive scores
    finished_tokens: Array  # [B, K, L]
    finished_scores: Array  # [B, K] length-penalized
    finished_mask: Array   # [B, K] bool
    cache: Any             # decode-state pytree, batch dim = B*K
    step: Array            # scalar
    cons: Any = ()         # lexical-constraint state pytree (or ())


def _gather_beams(tree: Any, indices: Array, batch: int, beams: int) -> Any:
    """Reorder a [B*K, ...] pytree by per-batch beam indices [B, K]."""
    flat_idx = (jnp.arange(batch)[:, None] * beams + indices).reshape(-1)

    def take(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch * beams:
            return x[flat_idx]
        return x

    return jax.tree_util.tree_map(take, tree)


def _length_penalty(length: Array, alpha: float) -> Array:
    # fairseq/GNMT: ((5 + len) / 6) ** alpha
    return ((5.0 + length) / 6.0) ** alpha


class SequenceGenerator:
    """Batched beam search over a step function.

    ``step_fn(cache, tokens[B*K, 1], step) -> (log_probs[B*K, V], cache)``
    must be jit-compatible with fixed shapes.
    """

    def __init__(
        self,
        step_fn: Callable,
        init_cache_fn: Callable[[int, int], Any],
        vocab_size: int,
        beam_size: int = 4,
        max_len: int = 256,
        len_penalty: float = 1.0,
        pad: int = 1,
        eos: int = 2,
        bos: Optional[int] = None,
        no_repeat_ngram_size: int = 0,
        unk_penalty: float = 0.0,
        unk: int = 3,
        diversity_groups: int = 1,
        diversity_strength: float = 0.5,
        diverse_siblings_gamma: float = 0.0,
        min_len: int = 1,
        min_len_a: float = 0.0,
        max_len_a: float = 0.0,
        max_len_b: Optional[int] = None,
    ):
        """Search-strategy knobs mirror ``fairseq/search.py``:

        * ``diversity_groups > 1``: Diverse Beam Search
          (``search.py:551-631``) — beams split into G groups; group g's
          candidate scores are penalized by ``strength`` x (count of each
          token already selected by groups < g this step).  As in fairseq,
          the penalty affects selection only for the alive set; eos/finish
          scoring uses unpenalized scores.
        * ``diverse_siblings_gamma > 0``: Diverse Siblings
          (``search.py:745-796``) — the rank-k candidate within each beam
          is penalized by ``k * gamma`` before the global top-K.
        * ``min_len`` / ``min_len_a`` / ``max_len_a`` / ``max_len_b``:
          LengthConstrainedBeamSearch (``search.py:526-549``) — with
          per-sentence source lengths (``generate(src_lengths=...)``),
          eos is banned while ``out_len < min_len_a*src + min_len`` and
          forced once ``out_len >= max_len_a*src + max_len_b`` (fairseq
          ``--min-len/--max-len-a/--max-len-b/--match-source-len``).
          ``max_len`` remains the static buffer cap.
        """
        self.step_fn = step_fn
        self.init_cache_fn = init_cache_fn
        self.vocab_size = vocab_size
        self.beam_size = beam_size
        self.max_len = max_len
        self.len_penalty = len_penalty
        self.pad, self.eos = pad, eos
        self.bos = eos if bos is None else bos
        self.no_repeat_ngram_size = no_repeat_ngram_size
        # fairseq SequenceGenerator: lprobs[:, unk] -= unk_penalty, applied
        # AFTER normalization (a pre-normalization subtraction would be
        # partially renormalized away)
        self.unk_penalty = unk_penalty
        self.unk = unk
        if diversity_groups > 1 and beam_size % diversity_groups != 0:
            raise ValueError("beam_size must be divisible by "
                             "diversity_groups (search.py:569-573)")
        if diversity_groups > 1 and diverse_siblings_gamma > 0:
            raise ValueError("diverse beam and diverse siblings are "
                             "mutually exclusive strategies")
        self.diversity_groups = diversity_groups
        self.diversity_strength = diversity_strength
        self.diverse_siblings_gamma = diverse_siblings_gamma
        self.min_len = min_len
        self.min_len_a = min_len_a
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        # the WHOLE beam loop is one jitted callable per generator
        # instance: repeat calls with the same shapes hit the executable
        # cache instead of re-tracing the decoder body every time (fairseq
        # gets this for free from eager CUDA-graph caching; under JAX an
        # un-jitted lax.while_loop construction re-lowers per call)
        self._jit_run = jax.jit(self._run, static_argnames=("batch",))

    def _ngram_block(self, tokens: Array, logp: Array, step: Array) -> Array:
        """Ban next-tokens completing an already-seen n-gram — vectorized
        JAX port of ``fairseq/ngram_repeat_block.py`` (CUDA kernel
        ``clib/cuda/ngram_repeat_block*``), runs inside the beam while_loop.

        tokens: [B, K, L]; logp: [B, K, V]."""
        n = self.no_repeat_ngram_size
        B, K, L = tokens.shape
        # suffix (n-1)-gram ending at position `step` (tokens[.., step] is
        # the newest emitted token)
        suffix = jax.lax.dynamic_slice_in_dim(
            tokens, step - (n - 2), n - 1, axis=2)  # [B, K, n-1]
        # all historical (n-1)-grams starting at i (next token at i+n-1)
        windows = jnp.stack(
            [tokens[:, :, i:L - (n - 1) + i] for i in range(n - 1)],
            axis=-1)  # [B, K, L-n+2, n-1]
        matches = jnp.all(windows == suffix[:, :, None, :], axis=-1)
        starts = jnp.arange(windows.shape[2])
        # valid history: start + n - 1 <= step
        valid = (starts + (n - 1) <= step) & (step >= n - 1)
        matches = matches & valid[None, None, :]
        next_tok = jnp.take_along_axis(
            tokens, jnp.minimum(starts + (n - 1), L - 1)[None, None, :],
            axis=2)  # [B, K, L-n+2]
        banned = jax.vmap(jax.vmap(
            lambda m, t: jnp.zeros(self.vocab_size, bool).at[t].max(m)
        ))(matches, next_tok)
        return jnp.where(banned, NEG_INF, logp)

    def _init_state(self, batch: int, init_cache_fn: Callable) -> BeamState:
        K, L = self.beam_size, self.max_len
        tokens = jnp.full((batch, K, L + 1), self.pad, jnp.int32)
        tokens = tokens.at[:, :, 0].set(self.bos)
        log_probs = jnp.tile(
            jnp.array([0.0] + [NEG_INF] * (K - 1)), (batch, 1))
        return BeamState(
            tokens=tokens,
            log_probs=log_probs,
            finished_tokens=tokens,
            finished_scores=jnp.full((batch, K), NEG_INF),
            finished_mask=jnp.zeros((batch, K), bool),
            cache=init_cache_fn(batch * K, L + 1),
            step=jnp.zeros((), jnp.int32),
        )

    def _select_alive(self, cand: Array, batch: int, step: Array):
        """Top-K alive candidates from ``cand`` [B, K, V] -> (scores [B, K],
        beam_idx [B, K], tok_idx [B, K]) under the configured strategy."""
        K, V = self.beam_size, self.vocab_size
        if self.diversity_groups > 1:
            # Diverse Beam Search: sequential group selection with a
            # cumulative token-count penalty (``search.py:611-631``).  At
            # step 0 only the root beam is alive, so every group selects
            # from it (fairseq BeamSearch.step's ::beam_size slice) —
            # token history and cache are identical across beams then, so
            # the beam-index mapping stays valid.
            G = self.diversity_groups
            k = K // G
            if k > 1:
                root = jnp.concatenate(
                    [cand[:, 0:1, :],
                     jnp.full((batch, k - 1, V), NEG_INF, cand.dtype)],
                    axis=1)
            else:
                root = cand[:, 0:1, :]
            counts = jnp.zeros((batch, V), cand.dtype)
            scores_g, beams_g, toks_g = [], [], []
            for g in range(G):
                group_cand = jnp.where(step == 0, root, cand[:, g::G, :])
                cand_g = (group_cand
                          - self.diversity_strength * counts[:, None, :])
                flat = cand_g.reshape(batch, k * V)
                s, idx = jax.lax.top_k(flat, k)
                b_local = idx // V
                t_idx = idx % V
                b_global = jnp.where(step == 0, 0, g + b_local * G)
                # store UNPENALIZED cumulative scores (penalty steers
                # selection only)
                s_raw = jnp.take_along_axis(
                    cand.reshape(batch, K * V), b_global * V + t_idx, axis=1)
                scores_g.append(s_raw)
                beams_g.append(b_global)
                toks_g.append(t_idx)
                counts = counts + jax.nn.one_hot(
                    t_idx, V, dtype=cand.dtype).sum(axis=1)
            top_scores = jnp.concatenate(scores_g, axis=1)
            beam_idx = jnp.concatenate(beams_g, axis=1)
            tok_idx = jnp.concatenate(toks_g, axis=1)
            # keep beams sorted best-first like plain beam search
            order = jnp.argsort(-top_scores, axis=1)
            return (jnp.take_along_axis(top_scores, order, axis=1),
                    jnp.take_along_axis(beam_idx, order, axis=1),
                    jnp.take_along_axis(tok_idx, order, axis=1))
        if self.diverse_siblings_gamma > 0:
            # Diverse Siblings: rank-penalized within-beam top-K then global
            # top-K (``search.py:745-796``)
            sib_scores, sib_toks = jax.lax.top_k(cand, K)  # [B, K, K]
            penalty = self.diverse_siblings_gamma * jnp.arange(
                1, K + 1, dtype=cand.dtype)
            penalized = sib_scores - penalty[None, None, :]
            flat = penalized.reshape(batch, K * K)
            top_scores, idx = jax.lax.top_k(flat, K)
            beam_idx = idx // K
            tok_idx = jnp.take_along_axis(
                sib_toks.reshape(batch, K * K), idx, axis=1)
            # cumulative scores keep the sibling penalty, as in fairseq
            return top_scores, beam_idx, tok_idx
        flat = cand.reshape(batch, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)
        return top_scores, top_idx // V, top_idx % V

    def generate(self, batch: int,
                 prefix_tokens: Optional[Array] = None,
                 constraints: Optional[Array] = None,
                 src_lengths: Optional[Array] = None,
                 ctx: Any = None) -> Tuple[Array, Array]:
        """Run the full beam loop; returns (tokens [B, K, L+1],
        scores [B, K]) sorted best-first.

        The loop runs under ``jax.jit`` — repeat calls with the same shapes
        reuse the compiled executable.  ``ctx`` is an arbitrary pytree
        passed through as the FIRST argument of ``step_fn(ctx, cache,
        tokens, step)`` and ``init_cache_fn(ctx, batch, max_len)``: model
        params / encoder outputs belong here (as traced jit arguments), NOT
        in the step_fn closure, where they would be baked into the
        executable as constants and force a re-trace per batch.  Without
        ``ctx`` the legacy 3-arg ``step_fn(cache, tokens, step)`` /
        2-arg ``init_cache_fn(batch, max_len)`` signatures apply.

        ``prefix_tokens`` [B, P] forces each hypothesis to begin with the
        given tokens (``sequence_generator.py:_prefix_tokens``; pad entries
        end a batch row's constraint early) — the fairseq
        ``--prefix-size`` / PrefixConstrainedBeamSearch behavior for static
        prefixes.

        ``constraints`` [B, NC, CL] (pad-padded token rows) requires every
        non-empty row to appear contiguously in the output — fairseq's
        ``--constraints`` / LexicallyConstrainedBeamSearch via dynamic bank
        allocation (``generation/constraints.py``); eos is banned until a
        hypothesis has generated all its constraints.
        """
        if prefix_tokens is not None:
            prefix_tokens = jnp.asarray(prefix_tokens, jnp.int32)
        if constraints is not None:
            constraints = jnp.asarray(constraints, jnp.int32)
            if self.diversity_groups > 1 or self.diverse_siblings_gamma > 0:
                raise ValueError("lexical constraints cannot combine with "
                                 "diverse search strategies (fairseq "
                                 "sequence_generator.py raises likewise)")
        if src_lengths is None and (self.min_len_a or self.max_len_a):
            raise ValueError("min_len_a/max_len_a scale with the source "
                             "length; pass generate(src_lengths=...)")
        return self._jit_run(ctx, prefix_tokens, constraints, src_lengths,
                             batch=batch)

    def _run(self, ctx: Any, prefix_tokens: Optional[Array],
             constraints: Optional[Array], src_lengths: Optional[Array],
             batch: int) -> Tuple[Array, Array]:
        if ctx is not None:
            step_fn = functools.partial(self.step_fn, ctx)
            init_cache_fn = functools.partial(self.init_cache_fn, ctx)
        else:
            step_fn, init_cache_fn = self.step_fn, self.init_cache_fn
        K, V = self.beam_size, self.vocab_size
        state = self._init_state(batch, init_cache_fn)
        # per-sentence output-length bounds (LengthConstrainedBeamSearch,
        # ``search.py:526-549``); scalar fallbacks without src_lengths
        if src_lengths is not None:
            sl = jnp.asarray(src_lengths, jnp.float32)
        else:
            sl = jnp.zeros((batch,), jnp.float32)
        min_lens = self.min_len_a * sl + self.min_len  # [B]
        cap = float(self.max_len)
        if self.max_len_b is None and self.max_len_a == 0.0:
            max_lens = jnp.full((batch,), cap)
        else:
            mlb = cap if self.max_len_b is None else float(self.max_len_b)
            max_lens = jnp.minimum(self.max_len_a * sl + mlb, cap)
        if constraints is not None:
            from efficient_attention_tpu.generation import constraints as C

            cons = constraints
            cons_lens = C.constraint_lengths(cons, self.pad)
            state = state._replace(
                cons=C.init_state(batch, K, cons.shape[1]))

        def cond(state: BeamState):
            best_alive = jnp.max(
                state.log_probs / _length_penalty(self.max_len, self.len_penalty),
                axis=1)
            worst_fin = jnp.min(
                jnp.where(state.finished_mask, state.finished_scores, NEG_INF),
                axis=1)
            all_done = jnp.all(
                jnp.all(state.finished_mask, axis=1) & (worst_fin >= best_alive))
            return (state.step < self.max_len) & ~all_done

        def body(state: BeamState) -> BeamState:
            cur = jax.lax.dynamic_slice_in_dim(
                state.tokens, state.step, 1, axis=2)  # [B, K, 1]
            logp, cache = step_fn(
                state.cache, cur.reshape(batch * K, 1), state.step)
            logp = logp.reshape(batch, K, V)
            logp = jax.nn.log_softmax(logp, axis=-1) \
                if not _is_normalized(logp) else logp
            if self.unk_penalty:
                logp = logp.at[:, :, self.unk].add(-self.unk_penalty)
            if self.no_repeat_ngram_size > 0:
                logp = self._ngram_block(state.tokens, logp, state.step)
            if prefix_tokens is not None:
                # force the next token while step < prefix length (pad in
                # the prefix releases the constraint for that row)
                P = prefix_tokens.shape[1]
                pos = jnp.minimum(state.step, P - 1)
                forced_tok = jax.lax.dynamic_slice_in_dim(
                    prefix_tokens, pos, 1, axis=1)  # [B, 1]
                active = ((state.step < P)
                          & (forced_tok[:, 0] != self.pad))  # [B]
                forced_mask = jax.nn.one_hot(
                    forced_tok, V, dtype=bool)  # [B, 1, V]
                logp = jnp.where(
                    active[:, None, None],
                    jnp.where(forced_mask, logp, NEG_INF), logp)
            step_len = state.step + 1
            # rows at their max output length must emit eos NOW — fairseq
            # compares the count of already-emitted tokens (its ``step``):
            # LengthConstrainedBeamSearch sets lprobs[..., eos] = 0 at
            # ``step >= max_lens`` and the generator -inf's everything else
            nsofar = state.step.astype(jnp.float32)
            force_eos = nsofar >= max_lens  # [B]
            eos_col = jnp.zeros((V,), bool).at[self.eos].set(True)
            logp = jnp.where(force_eos[:, None, None],
                             jnp.where(eos_col[None, None, :], 0.0, NEG_INF),
                             logp)
            cand = state.log_probs[..., None] + logp  # [B, K, V]

            # candidates ending in eos become finished hypotheses
            eos_scores = cand[:, :, self.eos] / _length_penalty(
                step_len.astype(jnp.float32), self.len_penalty)
            # eos banned below the per-sentence minimum output length
            # (``step < min_lens`` in search.py:544)
            eos_scores = jnp.where((nsofar >= min_lens)[:, None],
                                   eos_scores, NEG_INF)
            if constraints is not None:
                # unfinished hypotheses may not terminate
                # (``search.py:309-323``)
                fin = C.finished(cons_lens, state.cons)
                eos_scores = jnp.where(fin, eos_scores, NEG_INF)
            # merge into finished set (keep top-K of old + new)
            fin_scores = jnp.concatenate(
                [jnp.where(state.finished_mask, state.finished_scores,
                           NEG_INF),
                 eos_scores], axis=1)  # [B, 2K]
            eos_tokens = jax.lax.dynamic_update_slice_in_dim(
                state.tokens, jnp.full((batch, K, 1), self.eos, jnp.int32),
                state.step + 1, axis=2)
            fin_tokens = jnp.concatenate(
                [state.finished_tokens, eos_tokens], axis=1)  # [B, 2K, L]
            top_fin, fin_idx = jax.lax.top_k(fin_scores, K)
            new_finished_tokens = jnp.take_along_axis(
                fin_tokens, fin_idx[..., None], axis=1)
            new_finished_mask = top_fin > NEG_INF / 2

            # alive candidates: mask out eos, select under the strategy
            cand = cand.at[:, :, self.eos].set(NEG_INF)
            if constraints is not None:
                alive = state.log_probs > NEG_INF / 2
                top_scores, beam_idx, tok_idx = C.dba_select(
                    cand, state.cons, cons, cons_lens, alive, K)
            else:
                top_scores, beam_idx, tok_idx = self._select_alive(
                    cand, batch, state.step)
            new_tokens = jnp.take_along_axis(
                state.tokens, beam_idx[..., None], axis=1)
            new_tokens = jax.lax.dynamic_update_slice_in_dim(
                new_tokens, tok_idx[..., None].astype(jnp.int32),
                state.step + 1, axis=2)
            cache = _gather_beams(cache, beam_idx, batch, K)
            new_cons = state.cons
            if constraints is not None:
                new_cons = C.advance(
                    cons, cons_lens, C.gather_state(state.cons, beam_idx),
                    tok_idx)

            return BeamState(
                tokens=new_tokens,
                log_probs=top_scores,
                finished_tokens=new_finished_tokens,
                finished_scores=jnp.where(new_finished_mask, top_fin, NEG_INF),
                finished_mask=new_finished_mask,
                cache=cache,
                step=state.step + 1,
                cons=new_cons,
            )

        state = jax.lax.while_loop(cond, body, state)
        # fall back to alive beams when nothing finished
        alive_scores = state.log_probs / _length_penalty(
            jnp.maximum(state.step, 1).astype(jnp.float32), self.len_penalty)
        any_fin = jnp.any(state.finished_mask, axis=1, keepdims=True)
        scores = jnp.where(any_fin, state.finished_scores, alive_scores)
        tokens = jnp.where(any_fin[..., None], state.finished_tokens,
                           state.tokens)
        order = jnp.argsort(-scores, axis=1)
        tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
        scores = jnp.take_along_axis(scores, order, axis=1)
        return tokens, scores


def _is_normalized(logp: Array) -> bool:
    return False  # step_fn returns raw logits by convention; always normalize


def sample_decode(step_fn, init_cache_fn, batch, max_len, bos, eos, rng,
                  pad=1, temperature: float = 1.0, top_k: int = 0,
                  top_p: float = 0.0, return_scores: bool = False,
                  ctx: Any = None):
    """Ancestral / top-k / top-p sampling (``fairseq search.Sampling``,
    ``search.py:621-743``: ``--sampling --sampling-topk --sampling-topp
    --temperature``).  ``top_p`` keeps the smallest prefix of the sorted
    distribution whose cumulative probability reaches p (the boundary token
    included, as in ``_sample_topp``).  With ``return_scores``, also returns
    the summed log-probability of each sampled hypothesis (fairseq reports
    these as the H- line scores).  ``ctx`` follows the
    :meth:`SequenceGenerator.generate` convention (first argument of
    ``step_fn``/``init_cache_fn``)."""
    if ctx is not None:
        step_fn = functools.partial(step_fn, ctx)
        init_cache_fn = functools.partial(init_cache_fn, ctx)
    cache = init_cache_fn(batch, max_len + 1)

    def body(carry, step):
        tokens, cache, done, rng, score = carry
        logits, cache = step_fn(cache, tokens, step)
        logits = logits / jnp.maximum(temperature, 1e-6)
        if top_k > 0:
            kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
            logits = jnp.where(logits < kth, NEG_INF, logits)
        if top_p > 0.0:
            srt = jnp.sort(logits, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(srt, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # last kept rank: first index where cumulative mass >= p
            keep = (cum - probs) < top_p
            last = jnp.maximum(jnp.sum(keep, axis=-1) - 1, 0)
            thresh = jnp.take_along_axis(srt, last[:, None], axis=1)
            logits = jnp.where(logits < thresh, NEG_INF, logits)
        rng, sub = jax.random.split(rng)
        nxt = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
        score = score + jnp.where(done, 0.0, tok_lp)
        nxt = jnp.where(done, pad, nxt)[:, None]
        done = done | (nxt[:, 0] == eos)
        return (nxt, cache, done, rng, score), nxt[:, 0]

    init_tokens = jnp.full((batch, 1), bos, jnp.int32)
    done0 = jnp.zeros((batch,), bool)
    score0 = jnp.zeros((batch,), jnp.float32)
    (_, _, _, _, scores), outs = jax.lax.scan(
        body, (init_tokens, cache, done0, rng, score0), jnp.arange(max_len))
    tokens = jnp.swapaxes(outs, 0, 1)
    if return_scores:
        return tokens, scores
    return tokens


def greedy_decode(step_fn, init_cache_fn, batch, max_len, bos, eos, pad=1,
                  ctx: Any = None):
    """Greedy decoding as a lax.scan (used by eval/smoke paths)."""
    if ctx is not None:
        step_fn = functools.partial(step_fn, ctx)
        init_cache_fn = functools.partial(init_cache_fn, ctx)
    cache = init_cache_fn(batch, max_len + 1)

    def body(carry, step):
        tokens, cache, done = carry
        logp, cache = step_fn(cache, tokens, step)
        nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)[:, None]
        nxt = jnp.where(done[:, None], pad, nxt)
        done = done | (nxt[:, 0] == eos)
        return (nxt, cache, done), nxt[:, 0]

    init_tokens = jnp.full((batch, 1), bos, jnp.int32)
    done0 = jnp.zeros((batch,), bool)
    (_, _, _), outs = jax.lax.scan(
        body, (init_tokens, cache, done0), jnp.arange(max_len))
    return jnp.swapaxes(outs, 0, 1)  # [B, L]
