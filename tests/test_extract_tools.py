"""OCR-region FRCNN features + BERT embedding extraction tools."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _tiny_frcnn_cfg():
    from transformer_mm_explainability_tpu.models import frcnn

    return frcnn.FrcnnConfig(stages=(1, 1, 1, 1), pooler_resolution=7,
                             num_classes=5, num_attrs=3,
                             pre_nms_topk=50, post_nms_topk=10,
                             max_detections=4)


def test_image_scale_protocol():
    from transformer_mm_explainability_tpu.tools import (
        extract_ocr_features as ocr)

    # shortest → 800 when the cap is not hit
    assert ocr.image_scale(400, 600) == pytest.approx(2.0)
    # longest-edge cap engages: 800/300 * 1200 = 3200 > 1333
    assert ocr.image_scale(300, 1200) == pytest.approx(1333 / 1200)
    # boundary case 600×1000: scale·max = 1333.33 — the cap branch
    # must match resize_shortest_edge (no np.round), since the boxes
    # share the image's actual resize
    assert ocr.image_scale(600, 1000) == pytest.approx(1333 / 1000)
    from transformer_mm_explainability_tpu.ops import image as img_ops
    import jax.numpy as jnp

    resized = img_ops.resize_shortest_edge(
        jnp.zeros((600, 1000, 3)), 800, 1333)
    s = ocr.image_scale(600, 1000)
    assert resized.shape[:2] == (round(600 * s), round(1000 * s))


def test_ocr_roi_features_shapes_and_box_sensitivity():
    from transformer_mm_explainability_tpu.models import frcnn
    from transformer_mm_explainability_tpu.tools import (
        extract_ocr_features as ocr)

    cfg = _tiny_frcnn_cfg()
    params = frcnn.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    boxes = np.array([[2.0, 2.0, 40.0, 30.0],
                      [10.0, 5.0, 60.0, 45.0]], np.float32)

    feats = ocr.ocr_roi_features(params, img, boxes, cfg,
                                 target=48, cap=80)
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()
    # different boxes → different pooled features
    assert np.abs(feats[0] - feats[1]).max() > 1e-6

    empty = ocr.ocr_roi_features(params, img,
                                 np.zeros((0, 4), np.float32), cfg)
    assert empty.shape == (0, 2048)


def test_extract_from_imdb(tmp_path):
    from transformer_mm_explainability_tpu.models import frcnn
    from transformer_mm_explainability_tpu.tools import (
        extract_ocr_features as ocr)

    cfg = _tiny_frcnn_cfg()
    params = frcnn.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    images = {"a.jpg": (rng.rand(32, 40, 3) * 255).astype(np.uint8)}

    imdb = [
        {"image_id": "a", "image_path": "a.jpg",
         "feature_path": "train/a.npy", "image_width": 40,
         "image_height": 32,
         "ocr_normalized_boxes": [[0.1, 0.1, 0.6, 0.8]],
         "ocr_tokens": ["stop"]},
        # duplicate image_id must be deduped (reference :166-168)
        {"image_id": "a", "image_path": "a.jpg",
         "feature_path": "train/a.npy", "image_width": 40,
         "image_height": 32,
         "ocr_normalized_boxes": [[0.1, 0.1, 0.6, 0.8]],
         "ocr_tokens": ["stop"]},
        {"image_id": "b", "image_path": "missing.jpg",
         "feature_path": "train/b.npy", "image_width": 40,
         "image_height": 32, "ocr_normalized_boxes": [],
         "ocr_tokens": []},
    ]

    written = ocr.extract_from_imdb(
        params, imdb, str(tmp_path), str(tmp_path / "out"), cfg,
        target=32, cap=64,
        load_image=lambda p: images[os.path.basename(p)])
    assert len(written) == 2  # deduped

    feat_a = np.load(tmp_path / "out" / "train" / "a.npy")
    assert feat_a.shape == (1, 2048)
    info_a = np.load(tmp_path / "out" / "train" / "a_info.npy",
                     allow_pickle=True).item()
    np.testing.assert_allclose(info_a["ocr_boxes"],
                               [[4.0, 3.2, 24.0, 25.6]], rtol=1e-6)
    assert info_a["ocr_tokens"] == ["stop"]

    # zero OCR boxes → empty feature file, no image read attempted
    feat_b = np.load(tmp_path / "out" / "train" / "b.npy")
    assert feat_b.shape == (0, 2048)


def test_extract_bert_embeddings(tmp_path):
    from transformer_mm_explainability_tpu.data.tokenization import (
        BertTokenizer)
    from transformer_mm_explainability_tpu.models import bert as jbert
    from transformer_mm_explainability_tpu.tools import (
        extract_bert_embeddings as ebe)

    cfg = jbert.BertConfig(vocab_size=30, hidden_size=16,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=32,
                           max_position_embeddings=32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"emb": jbert.init_embedding_params(k1, cfg),
              "enc": jbert.init_encoder_params(k2, cfg)}
    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "what", "color", "is",
         "the", "cat", "dog"])}
    tok = BertTokenizer(vocab=vocab)

    imdb = [{"question_id": 11, "question_str": "what color is the cat"},
            {"question_id": 12, "question_str": "what is the dog"},
            {"question_id": 13, "question_str": "the cat"}]
    out_prefix = str(tmp_path) + "/q_"
    written = ebe.extract_bert(params, cfg, tok, imdb, out_prefix,
                               max_seq_length=12, batch_size=2)
    assert sorted(os.path.basename(w) for w in written) == [
        "q_11.npy", "q_12.npy", "q_13.npy"]
    emb = np.load(tmp_path / "q_11.npy")
    assert emb.shape == (16,) and np.isfinite(emb).all()

    # group sharding: only every n_groups-th element
    shard = ebe.extract_bert(params, cfg, tok, imdb,
                             str(tmp_path) + "/s_", group_id=1,
                             n_groups=2, max_seq_length=12)
    assert [os.path.basename(w) for w in shard] == ["s_12.npy"]

    # [CLS] embedding is question-dependent but padding-invariant
    emb13a = np.load(tmp_path / "q_13.npy")
    wide = ebe.extract_bert(params, cfg, tok, [imdb[2]],
                            str(tmp_path) + "/w_", max_seq_length=16)
    emb13b = np.load(wide[0])
    np.testing.assert_allclose(emb13a, emb13b, atol=1e-5)
    assert np.abs(emb - emb13a).max() > 1e-4
