"""Native C++ components: PHOC + TSV reader (vs python oracles and,
when compilable, the reference cphoc.c itself)."""

import base64
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from conftest import REFERENCE, has_reference

from transformer_mm_explainability_tpu import native
from transformer_mm_explainability_tpu.data import vqa


@pytest.fixture(scope="module", autouse=True)
def built():
    native.build()


WORDS = ["the", "a", "question", "42", "th", "lllllll", "x0x0x0"]


def test_phoc_native_vs_python():
    for w in WORDS:
        np.testing.assert_array_equal(native.build_phoc(w), native.phoc_py(w),
                                      err_msg=w)


def test_phoc_batch():
    batch = native.build_phoc_batch(WORDS)
    for i, w in enumerate(WORDS):
        np.testing.assert_array_equal(batch[i], native.build_phoc(w))


def test_phoc_rejects_unknown():
    with pytest.raises(ValueError):
        native.build_phoc("héllo")


@pytest.fixture(scope="module")
def ref_cphoc():
    """Compile the reference cphoc.c as a CPython extension (oracle)."""
    if not has_reference():
        pytest.skip("no reference")
    import sysconfig

    inc = sysconfig.get_paths()["include"]
    d = tempfile.mkdtemp()
    so = os.path.join(d, "cphoc.so")
    try:
        subprocess.check_call(
            ["gcc", "-O2", "-shared", "-fPIC", f"-I{inc}",
             str(REFERENCE / "VisualBERT/mmf/utils/phoc/src/cphoc.c"),
             "-o", so], stderr=subprocess.DEVNULL)
    except Exception:
        pytest.skip("cannot compile reference cphoc.c")
    sys.path.insert(0, d)
    import cphoc  # noqa

    return cphoc


def test_phoc_parity_vs_reference(ref_cphoc):
    for w in WORDS:
        want = np.asarray(ref_cphoc.build_phoc(w), np.float32)
        np.testing.assert_array_equal(native.build_phoc(w), want, err_msg=w)


def make_tsv(path, n_images=3, n_boxes=5, feat_dim=16, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_images):
        boxes = rng.rand(n_boxes, 4).astype(np.float32)
        feats = rng.randn(n_boxes, feat_dim).astype(np.float32)
        oid = rng.randint(0, 100, n_boxes).astype(np.int64)
        oconf = rng.rand(n_boxes).astype(np.float32)
        row = "\t".join([
            f"img_{i}", "480", "640",
            base64.b64encode(oid.tobytes()).decode(),
            base64.b64encode(oconf.tobytes()).decode(),
            base64.b64encode(oid.tobytes()).decode(),
            base64.b64encode(oconf.tobytes()).decode(),
            str(n_boxes),
            base64.b64encode(boxes.tobytes()).decode(),
            base64.b64encode(feats.tobytes()).decode(),
        ])
        rows.append((row, boxes, feats, oid, oconf))
    with open(path, "w") as f:
        f.write("\n".join(r[0] for r in rows) + "\n")
    return rows


def test_tsv_native_matches_python(tmp_path):
    p = str(tmp_path / "feats.tsv")
    rows = make_tsv(p)
    nat = native.tsv.load_obj_tsv(p)
    py = vqa.load_obj_tsv(p, use_native=False)
    assert len(nat) == len(py) == 3
    for a, b, (row, boxes, feats, oid, oconf) in zip(nat, py, rows):
        assert a["img_id"] == b["img_id"]
        assert a["img_h"] == b["img_h"] == 480
        assert a["num_boxes"] == b["num_boxes"] == 5
        np.testing.assert_allclose(a["boxes"], boxes, atol=0)
        np.testing.assert_allclose(a["features"], feats, atol=0)
        np.testing.assert_allclose(b["boxes"], boxes, atol=0)
        np.testing.assert_array_equal(a["objects_id"], oid)


def test_tsv_topk(tmp_path):
    p = str(tmp_path / "feats.tsv")
    make_tsv(p)
    assert len(native.tsv.load_obj_tsv(p, topk=2)) == 2


def test_tsv_malformed_rows_skipped(tmp_path):
    """Truncated/mismatched payloads must be dropped at parse time —
    tsv_get memcpys num_boxes*feat_dim floats, so a short decode would
    read out of bounds in native code parsing untrusted files."""
    import base64

    p = str(tmp_path / "bad.tsv")
    make_tsv(p, n_images=2, n_boxes=5, feat_dim=16)
    rng = np.random.RandomState(7)
    oid = rng.randint(0, 9, 5).astype(np.int64)
    oconf = rng.rand(5).astype(np.float32)
    b64 = lambda a: base64.b64encode(a.tobytes()).decode()
    bad_rows = [
        # features truncated: claims 5 boxes but carries 2 rows of feats
        "\t".join(["img_trunc", "480", "640", b64(oid), b64(oconf),
                   b64(oid), b64(oconf), "5",
                   b64(rng.rand(5, 4).astype(np.float32)),
                   b64(rng.randn(2, 16).astype(np.float32))]),
        # feature dim differs from the store-wide dim (16)
        "\t".join(["img_dim", "480", "640", b64(oid), b64(oconf),
                   b64(oid), b64(oconf), "5",
                   b64(rng.rand(5, 4).astype(np.float32)),
                   b64(rng.randn(5, 8).astype(np.float32))]),
        # boxes truncated
        "\t".join(["img_box", "480", "640", b64(oid), b64(oconf),
                   b64(oid), b64(oconf), "5",
                   b64(rng.rand(3, 4).astype(np.float32)),
                   b64(rng.randn(5, 16).astype(np.float32))]),
        # zero / negative num_boxes
        "\t".join(["img_zero", "480", "640", b64(oid), b64(oconf),
                   b64(oid), b64(oconf), "0",
                   b64(rng.rand(0, 4).astype(np.float32)),
                   b64(rng.randn(0, 16).astype(np.float32))]),
    ]
    with open(p, "a") as f:
        f.write("\n".join(bad_rows) + "\n")
    items = native.tsv.load_obj_tsv(p)
    assert [it["img_id"] for it in items] == ["img_0", "img_1"]
    for it in items:
        assert it["features"].shape == (5, 16)


def test_feature_store(tmp_path):
    p = str(tmp_path / "feats.tsv")
    make_tsv(p, n_boxes=5)
    items = vqa.load_obj_tsv(p)
    store = vqa.FeatureStore(items, max_boxes=8)
    rec = store["img_0"]
    assert rec["features"].shape == (8, 16)
    assert rec["boxes"].shape == (8, 4)
    assert rec["num_boxes"] == 5
    assert (rec["features"][5:] == 0).all()
    # boxes normalised by image size
    assert rec["boxes"][:5].max() <= 1.0


def test_answer_vocab():
    if not has_reference():
        pytest.skip("no reference data")
    vocab = vqa.AnswerVocab(
        str(REFERENCE / "data/vqa/trainval_ans2label.json"),
        str(REFERENCE / "data/vqa/trainval_label2ans.json"))
    assert len(vocab) == 3129
    scores = vocab.soft_scores({"yes": 1.0, "no": 0.3})
    assert scores.sum() == pytest.approx(1.3)
    assert scores[vocab.ans2label["yes"]] == 1.0
    assert vocab.answer(vocab.ans2label["yes"]) == "yes"


def test_tsv_open_mt_matches_sequential(tmp_path):
    """tsv_open_mt (parallel base64 decode, ordered merge) produces the
    same store as tsv_open — records, order, topk semantics."""
    p = tmp_path / "mt.tsv"
    make_tsv(p, n_images=17, n_boxes=6, feat_dim=12, seed=4)
    L = native.lib()
    for topk in (None, 5):
        h_seq = L.tsv_open(str(p).encode(), -1 if topk is None else topk)
        h_mt = L.tsv_open_mt(str(p).encode(),
                             -1 if topk is None else topk, 4)
        assert L.tsv_count(h_seq) == L.tsv_count(h_mt)
        assert L.tsv_feat_dim(h_seq) == L.tsv_feat_dim(h_mt)
        import ctypes
        for i in range(L.tsv_count(h_seq)):
            rows = []
            for h in (h_seq, h_mt):
                img_id = ctypes.create_string_buffer(64)
                ih, iw = ctypes.c_int(), ctypes.c_int()
                boxes = np.zeros((8, 4), np.float32)
                feats = np.zeros((8, 12), np.float32)
                oid = np.zeros(8, np.int64)
                oconf = np.zeros(8, np.float32)
                n = L.tsv_get(
                    h, i, img_id, 64, ctypes.byref(ih), ctypes.byref(iw),
                    boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    oid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    oconf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    8)
                rows.append((img_id.value, n, boxes, feats))
            assert rows[0][0] == rows[1][0]
            assert rows[0][1] == rows[1][1]
            np.testing.assert_array_equal(rows[0][2], rows[1][2])
            np.testing.assert_array_equal(rows[0][3], rows[1][3])
        L.tsv_close(h_seq)
        L.tsv_close(h_mt)


def test_batch_loader_matches_manual_collation(tmp_path):
    """BatchLoader batches == manual per-sample padding + LXMERT box
    normalisation, in the supplied (shuffled) order, tail batch short."""
    p = tmp_path / "load.tsv"
    rows = make_tsv(p, n_images=11, n_boxes=5, feat_dim=12, seed=5)
    store = native.TsvStore(str(p), n_threads=3)
    assert store.count == 11 and store.feat_dim == 12

    order = np.random.RandomState(0).permutation(11)
    loader = native.BatchLoader(store, order, batch=4, max_boxes=7,
                                depth=2, n_threads=2)
    assert loader.num_batches == 3
    got = list(loader)
    assert [b["k"] for b in got] == [4, 4, 3]
    flat = 0
    for b in got:
        for s in range(b["k"]):
            _, boxes, feats, _, _ = rows[order[flat]]
            n = boxes.shape[0]
            assert b["num_boxes"][s] == n
            np.testing.assert_array_equal(b["features"][s, :n], feats)
            np.testing.assert_array_equal(b["features"][s, n:], 0)
            want_boxes = boxes.copy()
            want_boxes[:, (0, 2)] /= 640.0  # img_w
            want_boxes[:, (1, 3)] /= 480.0  # img_h
            np.testing.assert_allclose(b["boxes"][s, :n], want_boxes,
                                       rtol=1e-6)
            flat += 1
    # exhausted: a fresh iter immediately stops
    assert list(loader) == []
    loader.close()
    store.close()


def test_batch_loader_unnormalized_and_errors(tmp_path):
    p = tmp_path / "raw.tsv"
    rows = make_tsv(p, n_images=3, n_boxes=4, feat_dim=8, seed=6)
    store = native.TsvStore(str(p))
    loader = native.BatchLoader(store, [0, 1, 2], batch=2, max_boxes=6,
                                normalize=False)
    b = next(iter(loader))
    np.testing.assert_array_equal(b["boxes"][0, :4], rows[0][1])
    loader.close()
    # out-of-range order index is rejected up front
    with pytest.raises(ValueError):
        native.BatchLoader(store, [0, 99], batch=2)
    store.close()


def test_tsv_majority_dim_beats_poisoned_first_row(tmp_path):
    """Regression: a corrupt first row whose truncated payload happens
    to divide num_boxes must not set the store dim — the majority dim
    wins and genuine rows survive."""
    import base64

    def row(img_id, n, dim):
        ids = base64.b64encode(
            np.arange(n, dtype=np.int64).tobytes()).decode()
        conf = base64.b64encode(
            np.ones(n, np.float32).tobytes()).decode()
        boxes = base64.b64encode(
            np.ones((n, 4), np.float32).tobytes()).decode()
        feats = base64.b64encode(
            np.full((n, dim), 2.0, np.float32).tobytes()).decode()
        return "\t".join([img_id, "10", "20", ids, conf, ids, conf,
                          str(n), boxes, feats])

    path = tmp_path / "poison.tsv"
    # first row: dim 8 (a truncated dim-16 row that still divides n);
    # three genuine dim-16 rows follow
    path.write_text("\n".join([row("bad", 4, 8)]
                              + [row(f"img{i}", 4, 16)
                                 for i in range(3)]) + "\n")
    from transformer_mm_explainability_tpu.native import tsv

    rows = tsv.load_obj_tsv(str(path))
    assert len(rows) == 3
    assert all(r["features"].shape == (4, 16) for r in rows)
    assert rows[0]["img_id"] == "img0"


def test_tsv_topk_corrupt_prefix_within_slack(tmp_path):
    """topk early-exit slack: a short corrupt prefix (< slack window)
    must not win the vote even when it reaches topk rows first."""
    import base64

    def row(img_id, n, dim):
        ids = base64.b64encode(
            np.arange(n, dtype=np.int64).tobytes()).decode()
        conf = base64.b64encode(
            np.ones(n, np.float32).tobytes()).decode()
        boxes = base64.b64encode(
            np.ones((n, 4), np.float32).tobytes()).decode()
        feats = base64.b64encode(
            np.full((n, dim), 2.0, np.float32).tobytes()).decode()
        return "\t".join([img_id, "10", "20", ids, conf, ids, conf,
                          str(n), boxes, feats])

    path = tmp_path / "prefix.tsv"
    corrupt = [row(f"bad{i}", 4, 8) for i in range(3)]
    genuine = [row(f"img{i}", 4, 16) for i in range(80)]
    path.write_text("\n".join(corrupt + genuine) + "\n")
    from transformer_mm_explainability_tpu.native import tsv

    rows = tsv.load_obj_tsv(str(path), topk=2)
    assert len(rows) == 2
    assert all(r["features"].shape == (4, 16) for r in rows)
