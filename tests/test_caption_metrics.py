"""Caption metrics (BLEU / ROUGE-L / CIDEr-D) vs hand-computed values.

pycocoevalcap is not installed in this image, so the oracle is the
published formulas evaluated by hand on small fixtures (and the exact
smoothing/penalty constants from tylin/coco-caption).
"""

import math

import numpy as np
import pytest

from transformer_mm_explainability_tpu.utils import caption_metrics as cm


# --------------------------------------------------------- tokenizer
def test_ptb_tokenize():
    assert cm.ptb_tokenize("A man, riding; a horse!") == "a man riding a horse"
    assert cm.ptb_tokenize("The dog's toy...") == "the dog's toy"
    assert cm.ptb_tokenize("  Hello   WORLD  ") == "hello world"


# -------------------------------------------------------------- BLEU
def test_bleu_perfect_match():
    gts = {0: ["the cat sat on the mat"], 1: ["a dog runs fast"]}
    res = {0: ["the cat sat on the mat"], 1: ["a dog runs fast"]}
    corpus, per_img = cm.BleuScorer(4).compute_score(gts, res)
    np.testing.assert_allclose(corpus, [1.0] * 4, atol=1e-6)
    np.testing.assert_allclose(per_img[3], [1.0, 1.0], atol=1e-6)


def test_bleu_hand_computed_with_brevity_penalty():
    # candidate "the cat" vs ref "the cat on the mat":
    # 1-gram: correct 2 / guess 2;  2-gram: correct 1 / guess 1
    # closest reflen 5, testlen 2 → BP = exp(1 - 5/2)
    gts = {0: ["the cat on the mat"]}
    res = {0: ["the cat"]}
    corpus, _ = cm.BleuScorer(2).compute_score(gts, res)
    bp = math.exp(1 - 5 / 2)
    np.testing.assert_allclose(corpus, [1.0 * bp, 1.0 * bp], rtol=1e-6)


def test_bleu_clipping_and_closest_reflen():
    # "the the the" vs ref "the cat": 1-gram correct clipped to 1 of 3
    gts = {0: ["the cat"]}
    res = {0: ["the the the"]}
    corpus, _ = cm.BleuScorer(1).compute_score(gts, res)
    # testlen 3 > reflen 2 → no BP; precision 1/3
    np.testing.assert_allclose(corpus, [1 / 3], rtol=1e-6)

    # closest reflen ties break to the SHORTER ref (closest option)
    scorer = cm.BleuScorer(1)
    testlen, reflen, _, _ = scorer._cook("a b c", ["x y", "p q r s"])
    assert (testlen, reflen) == (3, 2)


def test_bleu_corpus_pools_counts():
    # corpus BLEU pools counts across images — it is NOT the mean of
    # the per-image scores (the bleu_scorer totals protocol)
    gts = {0: ["a b c d"], 1: ["x y"]}
    res = {0: ["a b c d"], 1: ["x q"]}
    corpus, per_img = cm.BleuScorer(1).compute_score(gts, res)
    np.testing.assert_allclose(corpus, [(4 + 1) / (4 + 2)], rtol=1e-6)
    np.testing.assert_allclose(per_img[0], [1.0, 0.5], rtol=1e-6)


# ------------------------------------------------------------ ROUGE-L
def test_rouge_hand_computed():
    r = cm.Rouge()
    # cand "a b c", ref "a x c": LCS=2, P=2/3, R=2/3 → F=2/3
    assert r.calc_score(["a b c"], ["a x c"]) == pytest.approx(2 / 3)
    # max over refs: second ref matches fully
    assert r.calc_score(["a b c"], ["z z", "a b c"]) == pytest.approx(1.0)
    # asymmetric P/R with beta=1.2: cand "a b", refs "a b c d"
    # P=1, R=1/2 → (1+1.44)*1*0.5/(0.5+1.44*1)
    beta2 = 1.2 ** 2
    expect = (1 + beta2) * 1.0 * 0.5 / (0.5 + beta2 * 1.0)
    assert r.calc_score(["a b"], ["a b c d"]) == pytest.approx(expect)

    corpus, scores = r.compute_score(
        {0: ["a x c"], 1: ["q"]}, {0: ["a b c"], 1: ["q"]})
    assert scores == [pytest.approx(2 / 3), pytest.approx(1.0)]
    assert corpus == pytest.approx((2 / 3 + 1) / 2)


# ------------------------------------------------------------ CIDEr-D
def test_cider_perfect_match_is_ten():
    # two images with disjoint ngrams: df=1 everywhere, idf=log(2)>0;
    # identical candidate ⇒ clipped dot / norms = 1 per n, delta=0
    gts = {0: ["the cat sat on the mat"], 1: ["a dog runs very fast"]}
    res = {0: ["the cat sat on the mat"], 1: ["a dog runs very fast"]}
    corpus, scores = cm.CiderD().compute_score(gts, res)
    np.testing.assert_allclose(scores, [10.0, 10.0], rtol=1e-6)
    assert corpus == pytest.approx(10.0)


def test_cider_single_image_corpus_is_zero():
    # published quirk: N=1 ⇒ ref_len=log(1)=0 ⇒ all tf-idf weights 0
    gts = {0: ["the cat sat"]}
    res = {0: ["the cat sat"]}
    corpus, scores = cm.CiderD().compute_score(gts, res)
    assert corpus == 0.0 and scores == [0.0]


def test_cider_length_penalty_uses_bigram_delta():
    # candidate shares no higher-order overlap; check the gaussian on
    # a pure unigram match with different lengths
    gts = {0: ["a b"], 1: ["x y z w"]}
    res = {0: ["a"], 1: ["x y z w"]}
    _, scores = cm.CiderD(n=1, sigma=6.0).compute_score(gts, res)
    # n=1 ⇒ no bigrams tracked ⇒ length=0 both sides ⇒ delta=0:
    # score = clipped-cosine * 10; cand vec {a}, ref vec {a,b}
    # idf all log(2); cos = w^2 / (w * w*sqrt(2)) = 1/sqrt(2)
    np.testing.assert_allclose(scores[0], 10 / math.sqrt(2), rtol=1e-6)

    # with n=2 the delta quirk counts BIGRAMS: cand "a" has 0 bigrams,
    # ref "a b" has 1 → delta=1 applies exp(-1/72) to every n
    _, scores2 = cm.CiderD(n=2, sigma=6.0).compute_score(gts, res)
    pen = math.exp(-1 / (2 * 36.0))
    np.testing.assert_allclose(
        scores2[0], 10 * ((1 / math.sqrt(2)) * pen + 0.0 * pen) / 2,
        rtol=1e-6)


# ------------------------------------------------------------ harness
def test_calculate_metrics_end_to_end(tmp_path):
    gts = {"annotations": [
        {"image_id": 0, "caption": "The cat sat on the mat."},
        {"image_id": 0, "caption": "A cat is on a mat."},
        {"image_id": 1, "caption": "A dog runs fast!"},
    ]}
    res = {"annotations": [
        {"image_id": 0, "caption": "the cat sat on the mat"},
        {"image_id": 1, "caption": "a dog runs fast"},
    ]}
    out = cm.calculate_metrics([0, 1], gts, res)
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                        "ROUGE_L", "CIDEr"}
    np.testing.assert_allclose(
        [out["Bleu_1"], out["ROUGE_L"]], [1.0, 1.0], atol=1e-6)
    assert out["CIDEr"] > 5.0  # exact echoes of one ref per image


def test_calculate_metrics_ignores_out_of_subset_annotations():
    # full-val predictions scored against a subset must not KeyError
    # (pinned fix: the reference's dict-comprehension raises)
    gts = {"annotations": [
        {"image_id": 0, "caption": "a b c"},
        {"image_id": 99, "caption": "never scored"},
    ]}
    res = {"annotations": [
        {"image_id": 0, "caption": "a b c"},
        {"image_id": 42, "caption": "extra prediction"},
    ]}
    out = cm.calculate_metrics([0], gts, res)
    assert out["Bleu_1"] == pytest.approx(1.0, abs=1e-6)


def test_textcaps_eval_cli(tmp_path, capsys):
    import json

    from transformer_mm_explainability_tpu.tools import textcaps_eval

    imdb = np.array([
        {"dataset_name": "textcaps"},
        {"image_id": "i1", "caption_str": "a man rides a horse"},
        {"image_id": "i1", "caption_str": "a man on a horse"},
        {"image_id": "i2", "caption_str": "two birds fly away"},
    ], dtype=object)
    np.save(tmp_path / "imdb.npy", imdb)
    preds = [{"image_id": "i1", "caption": "a man rides a horse"},
             {"image_id": "i2", "caption": "two birds fly away"}]
    pf = tmp_path / "pred.json"
    pf.write_text(json.dumps(preds))

    metrics = textcaps_eval.main(
        ["--pred_file", str(pf),
         "--annotation_file", str(tmp_path / "imdb.npy")])
    assert metrics["Bleu_1"] == pytest.approx(1.0, abs=1e-6)
    out = capsys.readouterr().out
    assert "Final model performance" in out
    assert "Bleu_4 : 100.0" in out
    assert "METEOR" not in out.split("**********")[-1]  # not computed

    with pytest.raises(Exception, match="train and val"):
        textcaps_eval.main(["--pred_file", str(pf),
                            "--annotation_file",
                            str(tmp_path / "imdb.npy"),
                            "--set", "test"])


def test_caption_eval_cli(tmp_path, capsys):
    import json

    from transformer_mm_explainability_tpu.tools import coco_caption_eval

    ref = {"images": [
        {"split": "test", "sentences": [
            {"imgid": 7, "raw": "a man rides a horse"}]},
        {"split": "train", "sentences": [
            {"imgid": 8, "raw": "ignored"}]},
        {"split": "test", "sentences": [
            {"imgid": 9, "raw": "two birds fly away"}]},
    ]}
    preds = [{"image_id": 7, "caption": "a man rides a horse"},
             {"image_id": 9, "caption": "two birds fly away"}]
    rf, pf = tmp_path / "ref.json", tmp_path / "pred.json"
    rf.write_text(json.dumps(ref))
    pf.write_text(json.dumps(preds))

    metrics = coco_caption_eval.main(
        ["--reference_json", str(rf), "--predicted_json", str(pf)])
    assert metrics["Bleu_4"] == pytest.approx(1.0, abs=1e-6)
    assert metrics["CIDEr"] == pytest.approx(10.0, rel=1e-6)
    assert "Bleu_1" in capsys.readouterr().out
