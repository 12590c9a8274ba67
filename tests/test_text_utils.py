"""Text utils (C28/C34, mmf/utils/text.py): ngrams, VocabFromText,
beam-search optimality vs brute force, nucleus sampling semantics,
BUTD decode integration."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from transformer_mm_explainability_tpu.core.registry import registry
from transformer_mm_explainability_tpu.data import text_utils as T


def test_ngrams():
    toks = ["a", "b", "c", "d"]
    assert T.generate_ngrams(toks, 2) == ["a b", "b c", "c d"]
    assert T.generate_ngrams_range(toks, (1, 3)) == \
        ["a", "b", "c", "d", "a b", "b c", "c d"]


def test_vocab_from_text():
    v = T.VocabFromText(["the cat sat", "the cat ran", "dog"],
                        min_count=2)
    assert v.itos[:4] == ["<pad>", "<unk>", "<s>", "</s>"]
    assert "cat" in v.stoi and "the" in v.stoi
    assert "dog" not in v.stoi and "sat" not in v.stoi
    u = T.VocabFromText(["a b"], only_unk_extra=True)
    assert u.itos[0] == "<unk>" and u.PAD_INDEX == 0  # pad absent → 0


class _FixedModel:
    """Scores depend only on the previous token — brute-force
    comparable."""

    def __init__(self, table):
        self.table = np.asarray(table, np.float32)

    def scores(self, tokens):
        return self.table[tokens]


def _run_decoder(decoder, model, feats, max_steps=6):
    feats = decoder.init_batch(feats)
    data = {"texts": np.full((feats.shape[0], 1), 2, np.int64),
            "state": {"h": np.zeros((feats.shape[0], 1), np.float32)}}
    for t in range(max_steps):
        scores = model.scores(data["texts"][:, 0])
        finished, data, n = decoder.decode(t, data, scores)
        if finished:
            break
    return decoder.get_result()


def test_beam_search_finds_optimal_sequence():
    """Vocabulary: 0 pad, 1 unk, 2 <s>, 3 </s>, 4..6 words; transition
    log-scores known → brute-force the best finite sequence."""
    v = T.VocabFromText([], only_unk_extra=False)
    v.itos = ["<pad>", "<unk>", "<s>", "</s>", "w4", "w5", "w6"]
    v.stoi = {w: i for i, w in enumerate(v.itos)}
    v.PAD_INDEX, v.UNK_INDEX, v.SOS_INDEX, v.EOS_INDEX = 0, 1, 2, 3

    rs = np.random.RandomState(7)
    table = rs.randn(7, 7).astype(np.float32) * 2.0
    model = _FixedModel(table)

    bs = T.BeamSearch(v, beam_length=4)
    feats = np.zeros((1, 2, 3), np.float32)
    out = _run_decoder(bs, model, feats, max_steps=4)

    # brute force all sequences of ≤4 steps that end in EOS
    def logp(tokens):
        lp = 0.0
        prev = 2
        for tok in tokens:
            row = table[prev]
            row = row - (np.log(np.exp(row - row.max()).sum())
                         + row.max())
            lp += row[tok]
            prev = tok
        return lp

    best, best_lp = None, -np.inf
    import itertools
    for L in range(1, 5):
        for seq in itertools.product(range(7), repeat=L):
            if seq[-1] != 3 or any(s == 3 for s in seq[:-1]):
                continue
            lp = logp(seq)
            if lp > best_lp:
                best, best_lp = seq, lp
    got = [int(x) for x in out[0] if x != 0]
    assert got[0] == 2  # SOS prefix
    assert tuple(got[1:]) == best


def test_nucleus_sampling_thresholds():
    v = T.VocabFromText([], only_unk_extra=False)
    v.itos = ["<pad>", "<unk>", "<s>", "</s>", "w4"]
    v.stoi = {w: i for i, w in enumerate(v.itos)}
    v.PAD_INDEX, v.UNK_INDEX, v.SOS_INDEX, v.EOS_INDEX = 0, 1, 2, 3
    # token 3 (EOS) has overwhelming probability → tiny nucleus → ends
    table = np.full((5, 5), -10.0, np.float32)
    table[:, 3] = 10.0
    ns = T.NucleusSampling(v, sum_threshold=0.5,
                           rng=np.random.RandomState(0))
    out = _run_decoder(ns, _FixedModel(table),
                       np.zeros((1, 2, 3), np.float32))
    assert int(out[0, -1]) == 3  # ended at EOS

    assert registry.get("decoder", "beam_search") is T.BeamSearch
    assert registry.get("decoder", "nucleus_sampling") is T.NucleusSampling


def test_butd_decode_end_to_end():
    from transformer_mm_explainability_tpu.models import mmf_zoo as Z

    cfg = Z.ButdConfig(vocab_size=9, embedding_dim=8, hidden_dim=12,
                       attention_dim=12, image_feature_dim=10,
                       sos_index=2, max_length=5)
    params = Z.init_butd(jax.random.PRNGKey(0), cfg)
    feats = np.random.RandomState(1).randn(1, 4, 10).astype(np.float32)

    v = T.VocabFromText([], only_unk_extra=False)
    v.itos = [f"t{i}" for i in range(9)]
    v.stoi = {w: i for i, w in enumerate(v.itos)}
    v.PAD_INDEX, v.SOS_INDEX, v.EOS_INDEX, v.UNK_INDEX = 0, 2, 3, 1

    out = T.butd_decode(params, cfg, feats, T.BeamSearch(v, 3),
                        max_steps=5)
    assert out.shape[0] == 1
    assert int(out[0, 0]) == 2  # starts at SOS
    out_ns = T.butd_decode(params, cfg, feats,
                           T.NucleusSampling(v, 0.9,
                                             np.random.RandomState(3)),
                           max_steps=5)
    assert out_ns.shape[0] == 1
