"""On-device CTC prefix beam search (lax.scan, static shapes).

The reference's ``ctcBeamSearch`` is a pure-Python T x beam x C loop
(``utils.py:949-1038``) — the hot loop #3 of SURVEY.md.  This device
implementation runs the whole batch in one XLA program:

* standard merged-prefix formulation: each beam is a *collapsed* prefix
  with separate blank/non-blank path masses (log space) — mathematically
  the textbook CTC prefix beam search.  The host implementation
  (:mod:`ocrfa_tpu.decode.beam`) keys beams on blank-containing labelings
  instead (the reference's quirk); top-1 results agree except on
  probability ties, so the host decoder remains the strict-parity path
  while this one is the throughput path.
* per step: extend every beam with the top-K classes, merge duplicate
  prefixes by rolling-hash segmented logsumexp, keep the best B.

Shapes are fully static: prefixes live in a (B, T) buffer; the scan runs
exactly T steps; vmap batches rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30
# two independent rolling hashes to make collisions negligible
_P1 = jnp.uint32(1000003)
_P2 = jnp.uint32(10000019)


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    safe = mx + jnp.log1p(jnp.exp(jnp.maximum(mn - mx, -80.0)))
    return jnp.where(mx <= NEG_INF / 2, NEG_INF, safe)


def _beam_step(state, xs, beam_width: int, topk: int, max_t: int,
               lm_log=None, lm_factor: float = 0.0,
               trie_trans=None, trie_word=None, sep_idx: int = -1,
               oov_penalty: float = -4.0, word_bonus: float = 0.0,
               trie_word_id=None, word_lm_log=None,
               word_lm_factor: float = 0.0, merge: str = "dense"):
    # top-K non-blank classes are precomputed for ALL frames in one
    # batched sort before the scan (ctc_beam_search_device) — a per-step
    # top_k would sit on the sequential scan chain, where T sorts in a
    # row cost far more than one (T, C) sort that XLA parallelises
    prefix, length, h1, h2, pb, pnb, node, pword = state
    logp, top_vals, top_idx = xs
    b = beam_width
    k = topk

    ptot = _logaddexp(pb, pnb)
    logp_blank = logp[0]

    last = prefix[jnp.arange(b), jnp.maximum(length - 1, 0)]
    has_char = length > 0

    # ---- stay candidates (prefix unchanged): blank path + repeat path
    stay_pb = ptot + logp_blank
    stay_pnb = jnp.where(has_char, pnb + logp[last], NEG_INF)

    # ---- extend candidates (B, K): prefix + c
    c = jnp.broadcast_to(top_idx[None, :], (b, k))
    lp_c = jnp.broadcast_to(top_vals[None, :], (b, k))
    same_as_last = has_char[:, None] & (c == last[:, None])
    ext_pnb = jnp.where(same_as_last, pb[:, None] + lp_c, ptot[:, None] + lp_c)
    if lm_log is not None:
        # shallow fusion: bias every extension by the char-bigram log prior
        # (row 0 = start-of-text context; `last` is 0 for empty prefixes)
        ctx = jnp.where(has_char, last, 0)
        ext_pnb = ext_pnb + lm_factor * lm_log[ctx[:, None], c]
    if trie_trans is not None:
        # lexicon fusion: each beam walks the dictionary trie; extensions
        # that leave it pay `oov_penalty` per character, a separator pays
        # `word_bonus`/`oov_penalty` for completed/incomplete words and
        # restarts the walk (device analog of decode_wordbeamsearch's
        # per-word dictionary beams, utils.py:1124-1173)
        in_trie = node >= 0
        safe = jnp.maximum(node, 0)
        nxt = jnp.where(in_trie[:, None], trie_trans[safe[:, None], c], -1)
        is_sep = c == sep_idx
        word_ok = in_trie & trie_word[safe]
        lex_score = jnp.where(
            is_sep,
            jnp.where(word_ok[:, None], word_bonus, oov_penalty),
            jnp.where(nxt >= 0, 0.0, oov_penalty),
        )
        next_node = jnp.where(is_sep, 0, nxt)
        ext_pnb = ext_pnb + lex_score
        if word_lm_log is not None:
            # word-level shallow fusion: a separator closes the current
            # word — score it against the previous word's bigram row
            # (rows/cols per WordNGramLM.bigram_log_matrix: V=<s> context,
            # V+1=<unk> for OOV/incomplete walks) and advance the per-beam
            # word context.  Non-separator extensions leave both untouched.
            unk = word_lm_log.shape[0] - 1
            wid = jnp.where(word_ok, trie_word_id[safe], unk)
            ext_pnb = ext_pnb + jnp.where(
                is_sep,
                word_lm_factor * word_lm_log[pword[:, None],
                                             wid[:, None]],
                0.0)
            next_pword = jnp.where(is_sep, wid[:, None],
                                   pword[:, None]).astype(jnp.int32)
        else:
            next_pword = jnp.broadcast_to(pword[:, None], (b, k))
    else:
        next_node = jnp.broadcast_to(node[:, None], (b, k))
        next_pword = jnp.broadcast_to(pword[:, None], (b, k))
    ext_pb = jnp.full((b, k), NEG_INF)

    # flatten candidates: B stays then B*K extends
    cand_h1 = jnp.concatenate([h1, (h1[:, None] * _P1 + c.astype(jnp.uint32)).reshape(-1)])
    cand_h2 = jnp.concatenate([h2, (h2[:, None] * _P2 + c.astype(jnp.uint32)).reshape(-1)])
    cand_pb = jnp.concatenate([stay_pb, ext_pb.reshape(-1)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
    parent = jnp.concatenate([jnp.arange(b), jnp.repeat(jnp.arange(b), k)])
    newchar = jnp.concatenate([jnp.full((b,), -1), c.reshape(-1)]).astype(jnp.int32)
    cand_node = jnp.concatenate([node, next_node.reshape(-1)])
    cand_pword = jnp.concatenate([pword, next_pword.reshape(-1)])

    m = b + b * k
    # dead parents must not merge with anything: give them unique hashes
    dead = _logaddexp(cand_pb, cand_pnb) <= NEG_INF / 2
    uniq = (jnp.arange(m, dtype=jnp.uint32) + jnp.uint32(0x80000000))
    cand_h1 = jnp.where(dead, uniq, cand_h1)
    cand_h2 = jnp.where(dead, uniq * _P2, cand_h2)

    if merge == "dense":
        # ---- merge duplicates: dense (m, m) hash-equality matrix.
        # m = B + B*K is small (72 at B=K=8), and TPUs hate the
        # alternative — lexsort is two bitonic passes and the segment_*
        # reductions lower to sorted scatters; the dense form is pure
        # elementwise/reduction work on an (m, m) tile (the fix for
        # BEAM_r3's 0.48x-greedy device beam, VERDICT r3 #7).
        eq = (cand_h1[:, None] == cand_h1[None, :]) & (
            cand_h2[:, None] == cand_h2[None, :])
        # representative = first candidate of its equality class
        rep_of = jnp.argmax(eq, axis=1)
        is_rep = rep_of == jnp.arange(m)

        def seg_lse(v):
            vm = jnp.where(eq, v[None, :], NEG_INF)
            mx = jnp.max(vm, axis=1)
            s = jnp.sum(jnp.where(eq, jnp.exp(vm - mx[:, None]), 0.0),
                        axis=1)
            return jnp.where(s > 0, jnp.log(s) + mx, NEG_INF)

        new_pb_seg = seg_lse(cand_pb)
        new_pnb_seg = seg_lse(cand_pnb)
        score_seg = jnp.where(is_rep,
                              _logaddexp(new_pb_seg, new_pnb_seg), NEG_INF)

        # ---- select top-B representatives
        best_scores, rep = jax.lax.top_k(score_seg, b)
        best_seg = rep
    else:
        # ---- merge duplicates: lexsort by the hash pair, segment-
        # logsumexp (kept as the measured baseline; a single uint64 key
        # silently truncates to uint32 without x64)
        order = jnp.lexsort((cand_h2, cand_h1))
        h1_s = cand_h1[order]
        h2_s = cand_h2[order]
        pb_s = cand_pb[order]
        pnb_s = cand_pnb[order]

        seg_start = jnp.concatenate([
            jnp.array([True]),
            (h1_s[1:] != h1_s[:-1]) | (h2_s[1:] != h2_s[:-1]),
        ])
        seg_id = jnp.cumsum(seg_start) - 1
        # logsumexp per segment, numerically safe: subtract the max first
        seg_max = jax.ops.segment_max(jnp.maximum(pb_s, pnb_s), seg_id,
                                      num_segments=m)
        seg_max_g = seg_max[seg_id]
        exp_pb = jnp.where(pb_s > NEG_INF / 2, jnp.exp(pb_s - seg_max_g), 0.0)
        exp_pnb = jnp.where(pnb_s > NEG_INF / 2,
                            jnp.exp(pnb_s - seg_max_g), 0.0)
        sum_pb = jax.ops.segment_sum(exp_pb, seg_id, num_segments=m)
        sum_pnb = jax.ops.segment_sum(exp_pnb, seg_id, num_segments=m)
        new_pb_seg = jnp.where(sum_pb > 0, jnp.log(sum_pb) + seg_max, NEG_INF)
        new_pnb_seg = jnp.where(sum_pnb > 0,
                                jnp.log(sum_pnb) + seg_max, NEG_INF)
        score_seg = _logaddexp(new_pb_seg, new_pnb_seg)
        n_segs = seg_id[-1] + 1
        valid_seg = jnp.arange(m) < n_segs
        score_seg = jnp.where(valid_seg, score_seg, NEG_INF)

        # representative candidate (first in sorted order) per segment
        first_sorted_idx = jax.ops.segment_min(
            jnp.arange(m), seg_id, num_segments=m
        )
        rep_cand = order[jnp.clip(first_sorted_idx, 0, m - 1)]

        # ---- select top-B segments
        best_scores, best_seg = jax.lax.top_k(score_seg, b)
        rep = rep_cand[best_seg]
    par = parent[rep]
    ch = newchar[rep]

    new_prefix = prefix[par]
    new_length = length[par]
    write_pos = jnp.clip(new_length, 0, max_t - 1)
    extend = ch >= 0
    new_prefix = jnp.where(
        extend[:, None]
        & (jnp.arange(max_t)[None, :] == write_pos[:, None]),
        ch[:, None],
        new_prefix,
    )
    new_length = jnp.where(extend, jnp.minimum(new_length + 1, max_t), new_length)
    new_h1 = cand_h1[rep]
    new_h2 = cand_h2[rep]
    new_node = cand_node[rep]
    new_pword = cand_pword[rep]
    new_pb = new_pb_seg[best_seg]
    new_pnb = new_pnb_seg[best_seg]
    new_pb = jnp.where(best_scores <= NEG_INF / 2, NEG_INF, new_pb)
    new_pnb = jnp.where(best_scores <= NEG_INF / 2, NEG_INF, new_pnb)

    return (new_prefix, new_length, new_h1, new_h2, new_pb, new_pnb,
            new_node, new_pword), None


# only the shape-determining knobs are static; lm_factor/sep_idx/
# oov_penalty/word_bonus trace as scalars so sweeping them (e.g. the
# eval_lexicon OOV-penalty sweep) reuses one compiled program
@partial(jax.jit, static_argnames=("beam_width", "topk", "merge"))
def ctc_beam_search_device(log_probs, beam_width: int = 8, topk: int = 8,
                           lm_log=None, lm_factor: float = 0.3,
                           trie_trans=None, trie_word=None, sep_idx: int = -1,
                           oov_penalty: float = -4.0,
                           word_bonus: float = 0.0,
                           trie_word_id=None, word_lm_log=None,
                           word_lm_factor: float = 0.5,
                           merge: str = "dense"):
    """Batch CTC beam decode.

    Args:
      log_probs: (N, T, C) log probabilities (blank = class 0).
      lm_log: optional (C, C) ``log P(col | row)`` char-bigram matrix
        (:meth:`ocrfa_tpu.decode.lm.CharBigramLM.log_matrix`); every beam
        extension is biased by ``lm_factor * lm_log[prev, c]`` inside the
        scan (shallow fusion — the TPU analog of the reference's dormant
        applyLM slot, utils.py:875-883).
      trie_trans/trie_word: optional dense lexicon trie
        (:class:`ocrfa_tpu.decode.lexicon.LexiconTrie` ``.trans``/
        ``.is_word``).  Beams walk the dictionary inside the scan:
        extensions leaving it pay ``oov_penalty`` (log-space, per char);
        a ``sep_idx`` extension pays ``word_bonus`` when the walk sits on
        a completed word (else ``oov_penalty``) and restarts at the root —
        the device analog of the reference's dictionary word-beam-search
        (utils.py:1124-1173) without per-word host loops.
      trie_word_id/word_lm_log: optional word-level bigram fusion on top of
        the trie (requires ``trie_trans``): ``trie_word_id`` is the trie's
        node->word-id map (:attr:`LexiconTrie.word_id`), ``word_lm_log`` the
        dense ``(V+2, V+2)`` matrix from
        :meth:`~ocrfa_tpu.decode.lm.WordNGramLM.bigram_log_matrix` built
        over ``trie.words``.  Each beam carries its previous word id
        (start = ``V``, the ``<s>`` row); every separator extension adds
        ``word_lm_factor * log P(closed word | previous word)``, with
        OOV/incomplete walks scored as ``<unk>`` (``V+1``).  The final
        unterminated word is not scored — use
        :meth:`WordNGramLM.rescore` on the returned beams when end-of-line
        context matters.

    Returns ``(prefixes, lengths, scores)``: best-first collapsed label
    sequences ``(N, B, T)`` with valid ``lengths (N, B)`` and total log
    probabilities ``(N, B)``.
    """
    if word_lm_log is not None and (trie_trans is None or trie_word_id is None):
        raise ValueError("word_lm_log needs the lexicon trie: pass "
                         "trie_trans/trie_word and trie_word_id")
    n, t, c = log_probs.shape
    topk = min(topk, c - 1)

    def one_row(row):
        b = beam_width
        prefix = jnp.zeros((b, t), dtype=jnp.int32)
        length = jnp.zeros((b,), dtype=jnp.int32)
        h1 = jnp.zeros((b,), dtype=jnp.uint32)
        h2 = jnp.zeros((b,), dtype=jnp.uint32)
        pb = jnp.full((b,), NEG_INF).at[0].set(0.0)
        pnb = jnp.full((b,), NEG_INF)
        node = jnp.zeros((b,), dtype=jnp.int32)
        # previous-word context: <s> row of the word-bigram matrix (a
        # plain zero placeholder when word fusion is off)
        start_word = word_lm_log.shape[0] - 2 if word_lm_log is not None else 0
        pword = jnp.full((b,), start_word, dtype=jnp.int32)

        step = partial(_beam_step, beam_width=b, topk=topk, max_t=t,
                       lm_log=lm_log, lm_factor=lm_factor,
                       trie_trans=trie_trans, trie_word=trie_word,
                       sep_idx=sep_idx, oov_penalty=oov_penalty,
                       word_bonus=word_bonus, trie_word_id=trie_word_id,
                       word_lm_log=word_lm_log,
                       word_lm_factor=word_lm_factor, merge=merge)
        top_vals, top_idx = jax.lax.top_k(row[:, 1:], topk)  # (T, K)
        (prefix, length, _, _, pb, pnb, _, _), _ = jax.lax.scan(
            step,
            (prefix, length, h1, h2, pb, pnb, node, pword),
            (row, top_vals, top_idx + 1),
        )
        score = _logaddexp(pb, pnb)
        order = jnp.argsort(-score)
        return prefix[order], length[order], score[order]

    return jax.vmap(one_row)(log_probs)


def decode_beams_to_text(prefixes, lengths, characters, ignore_idx=(0,)):
    """Top-1 beam -> strings (host side)."""
    import numpy as np

    chars = np.array(characters)
    ignore = set(ignore_idx)
    texts = []
    for row_prefix, row_len in zip(np.asarray(prefixes), np.asarray(lengths)):
        ids = row_prefix[0][: row_len[0]]
        texts.append("".join(chars[i] for i in ids if i not in ignore))
    return texts


def decode_all_beams_to_text(prefixes, lengths, scores, characters,
                             ignore_idx=(0,)):
    """Every beam -> per-sample ``[(text, logprob), ...]`` best-first, dead
    beams (score ~ -inf) dropped — the host-rescoring surface (e.g.
    :meth:`~ocrfa_tpu.decode.lm.WordNGramLM.rescore`)."""
    import numpy as np

    chars = np.array(characters)
    ignore = set(ignore_idx)
    out = []
    for row_prefix, row_len, row_score in zip(
            np.asarray(prefixes), np.asarray(lengths), np.asarray(scores)):
        beams = []
        for ids, n, s in zip(row_prefix, row_len, row_score):
            if s <= NEG_INF / 2:
                continue
            beams.append(("".join(chars[i] for i in ids[:n]
                                  if i not in ignore), float(s)))
        out.append(beams)
    return out
