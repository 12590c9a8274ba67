"""Dataset-prep tooling: lmdb_tools, extract_vocab, extract_grid_feats.

The lmdb package is optional (not in this image), so lmdb_tools is
driven through an in-memory fake implementing the open/begin/put/get
surface the tool uses — the record schema is then asserted against
what data/databases.LmdbFeatureReader expects.
"""

import os

import numpy as np
import pytest


# ---------------------------------------------------------------- lmdb
class _FakeTxn:
    def __init__(self, store):
        self._store = store

    def put(self, key, value):
        self._store[bytes(key)] = bytes(value)

    def get(self, key):
        return self._store.get(bytes(key))

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    _dbs = {}

    def __init__(self, path):
        self._store = _FakeEnv._dbs.setdefault(path, {})

    def begin(self, write=False, **kw):
        return _FakeTxn(self._store)


class _FakeLmdb:
    @staticmethod
    def open(path, **kw):
        return _FakeEnv(path)


@pytest.fixture
def fake_lmdb():
    _FakeEnv._dbs.clear()
    yield _FakeLmdb
    _FakeEnv._dbs.clear()


def _write_npy_folder(root):
    rng = np.random.RandomState(0)
    feats = {}
    for name, n in [("coco_1", 4), ("coco_2", 7)]:
        f = rng.randn(n, 16).astype(np.float32)
        feats[name] = f
        np.save(os.path.join(root, name + ".npy"), f)
        np.save(os.path.join(root, name + "_info.npy"), {
            "image_height": 480, "image_width": 640, "num_boxes": n,
            "objects": np.arange(n), "cls_prob": None,
            "bbox": rng.rand(n, 4).astype(np.float32)})
    # one file without a sidecar (lmdb_conversion.py:60-62)
    bare = rng.randn(3, 16).astype(np.float32)
    feats["coco_3"] = bare
    np.save(os.path.join(root, "coco_3.npy"), bare)
    return feats


def test_lmdb_roundtrip(tmp_path, fake_lmdb):
    from transformer_mm_explainability_tpu.tools import lmdb_tools

    src = tmp_path / "feats"
    src.mkdir()
    feats = _write_npy_folder(str(src))

    keys = lmdb_tools.convert_dir_to_lmdb(
        str(src), str(tmp_path / "store.lmdb"), lmdb_module=fake_lmdb)
    assert keys == [b"coco_1", b"coco_2", b"coco_3"]

    # record schema matches what LmdbFeatureReader reads back
    import pickle

    store = _FakeEnv._dbs[str(tmp_path / "store.lmdb")]
    assert pickle.loads(store[b"keys"]) == keys
    rec = pickle.loads(store[b"coco_1"])
    assert rec["feature_path"] == "coco_1"
    np.testing.assert_array_equal(rec["features"], feats["coco_1"])
    assert rec["image_height"] == 480 and rec["num_boxes"] == 4

    out = tmp_path / "out"
    ids = lmdb_tools.extract_lmdb_to_dir(
        str(tmp_path / "store.lmdb"), str(out), lmdb_module=fake_lmdb)
    assert ids == ["coco_1", "coco_2", "coco_3"]
    for name, f in feats.items():
        np.testing.assert_array_equal(
            np.load(out / (name + ".npy"), allow_pickle=True), f)
    info = np.load(out / "coco_2_info.npy", allow_pickle=True).item()
    # height stays height (reference bug :95 writes width — pinned fix)
    assert info["image_height"] == 480 and info["image_width"] == 640
    bare_info = np.load(out / "coco_3_info.npy", allow_pickle=True).item()
    assert bare_info["num_boxes"] is None  # no sidecar on conversion


def test_lmdb_roundtrip_nested_dirs(tmp_path, fake_lmdb):
    from transformer_mm_explainability_tpu.tools import lmdb_tools

    src = tmp_path / "feats" / "train2014"
    src.mkdir(parents=True)
    f = np.arange(8, dtype=np.float32).reshape(2, 4)
    np.save(src / "x.npy", f)
    keys = lmdb_tools.convert_dir_to_lmdb(
        str(tmp_path / "feats"), str(tmp_path / "db"),
        lmdb_module=fake_lmdb)
    assert keys == [b"train2014/x"]
    out = tmp_path / "out"
    ids = lmdb_tools.extract_lmdb_to_dir(
        str(tmp_path / "db"), str(out), lmdb_module=fake_lmdb)
    assert ids == ["train2014/x"]
    np.testing.assert_array_equal(
        np.load(out / "train2014" / "x.npy"), f)


def test_lmdb_reader_consumes_converted_store(tmp_path, fake_lmdb,
                                              monkeypatch):
    """End-to-end: the converted store is readable through
    data/databases.LmdbFeatureReader via the same fake module."""
    import sys

    from transformer_mm_explainability_tpu.data import databases
    from transformer_mm_explainability_tpu.tools import lmdb_tools

    src = tmp_path / "feats"
    src.mkdir()
    feats = _write_npy_folder(str(src))
    db_path = str(tmp_path / "store.lmdb")
    os.makedirs(db_path)  # reader requires the path to exist
    lmdb_tools.convert_dir_to_lmdb(str(src), db_path,
                                   lmdb_module=fake_lmdb)

    import types

    fake_mod = types.ModuleType("lmdb")
    fake_mod.open = _FakeLmdb.open
    fake_mod.__spec__ = __import__("importlib.machinery", fromlist=[
        "ModuleSpec"]).ModuleSpec("lmdb", None)
    monkeypatch.setitem(sys.modules, "lmdb", fake_mod)

    reader = databases.LmdbFeatureReader(max_loc=8, db_path=db_path)
    feat, info = reader.read(os.path.join(db_path, "coco_1.npy"))
    assert feat.shape == (8, 16)
    np.testing.assert_array_equal(feat[:4], feats["coco_1"])
    assert info["max_features"] == 4


# --------------------------------------------------------------- vocab
def test_extract_vocabulary_counts_and_sorting(tmp_path):
    from transformer_mm_explainability_tpu.tools import extract_vocab

    texts = ["What's the man riding?", "Is the man tall, or short?",
             "What color?"]
    vocab, lengths = extract_vocab.extract_vocabulary(texts, min_freq=0)
    assert lengths == [6, 6, 2]
    assert vocab == sorted(vocab)
    assert "man" in vocab and "the" in vocab
    assert "?" not in "".join(vocab) and "," not in "".join(vocab)
    # the MMF tokenizer splits "what's" → what / ' / s
    assert "'" in vocab and "s" in vocab

    vocab2, _ = extract_vocab.extract_vocabulary(texts, min_freq=2)
    assert set(vocab2) == {"man", "the", "what"}

    import json

    qf = tmp_path / "q.json"
    qf.write_text(json.dumps(
        {"questions": [{"question": texts[0]}, {"question": texts[1]}]}))
    got = extract_vocab.texts_from_question_files([str(qf)])
    assert got == texts[:2]

    out = extract_vocab.save_vocabulary(vocab2, str(tmp_path))
    assert open(out).read() == "man\nthe\nwhat\n"


def test_extract_vocab_cli(tmp_path, capsys):
    import json

    from transformer_mm_explainability_tpu.tools import extract_vocab

    qf = tmp_path / "q.json"
    qf.write_text(json.dumps({"questions": ["a b c", "a b"]}))
    extract_vocab.main(["--input_files", str(qf),
                        "--out_dir", str(tmp_path),
                        "--min_freq", "2"])
    assert (tmp_path / "vocabulary.txt").read_text() == "a\nb\n"
    outp = capsys.readouterr().out
    assert "min text len= 2" in outp and "max text len= 3" in outp


# ---------------------------------------------------------- grid feats
def test_preprocess_image_protocol():
    from transformer_mm_explainability_tpu.tools import extract_grid_feats

    rng = np.random.RandomState(0)
    img = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
    x = extract_grid_feats.preprocess_image(img)
    assert x.shape == (448, 448, 3) and x.dtype == np.float32

    # normalisation inverts exactly to the PIL-resized [0,1] image
    # (torchvision's Resize/ToTensor/Normalize compose to the same
    # bilinear-resize + (x-mean)/std pipeline; torchvision itself is
    # not shipped in this image)
    from PIL import Image

    resized = np.asarray(
        Image.fromarray(img).resize((448, 448), Image.BILINEAR),
        np.float32) / 255.0
    np.testing.assert_allclose(
        x * extract_grid_feats.CHANNEL_STD + extract_grid_feats.CHANNEL_MEAN,
        resized, atol=1e-6)

    grey = extract_grid_feats.preprocess_image(img[..., 0])
    assert grey.shape == (448, 448, 3)
    np.testing.assert_array_equal(grey[..., 0] * 0 + grey[..., 1],
                                  grey[..., 1])


def test_extract_dataset_pool5(tmp_path):
    from PIL import Image

    from transformer_mm_explainability_tpu.tools import extract_grid_feats

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(4):
        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"COCO_val_{i:012d}.jpg")

    trunk = extract_grid_feats.make_trunk(stages=(1, 1, 1, 1))
    out = tmp_path / "feats"
    written = extract_grid_feats.extract_dataset_pool5(
        str(img_dir), str(out), total_group=2, group_id=0,
        trunk=trunk, batch_size=2)
    # group sharding: even image ids only
    names = sorted(os.path.basename(w) for w in written)
    assert names == ["COCO_val_000000000000.npy",
                     "COCO_val_000000000002.npy"]
    feat = np.load(out / names[0])
    assert feat.shape[0] == 1 and feat.ndim == 4  # [1, h, w, C] NHWC

    # second run skips completed files
    again = extract_grid_feats.extract_dataset_pool5(
        str(img_dir), str(out), total_group=2, group_id=0,
        trunk=trunk, batch_size=2)
    assert again == []

    # other shard picks up the odd ids
    odd = extract_grid_feats.extract_dataset_pool5(
        str(img_dir), str(out), total_group=2, group_id=1,
        trunk=trunk, batch_size=2)
    assert len(odd) == 2

    # a stale .lock next to a finished .npy marks a crashed worker:
    # the (possibly truncated) file must be regenerated
    victim = out / "COCO_val_000000000000.npy"
    os.makedirs(str(victim) + ".lock")
    np.save(victim, np.zeros((1, 1, 1, 1), np.float32))  # "truncated"
    redo = extract_grid_feats.extract_dataset_pool5(
        str(img_dir), str(out), total_group=2, group_id=0,
        trunk=trunk, batch_size=2)
    assert [os.path.basename(w) for w in redo] == [
        "COCO_val_000000000000.npy"]
    assert not os.path.exists(str(victim) + ".lock")
    assert np.load(victim).shape != (1, 1, 1, 1)


def test_extract_pool5_extension_handling(tmp_path):
    from PIL import Image

    from transformer_mm_explainability_tpu.tools import extract_grid_feats

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    arr = np.zeros((16, 16, 3), np.uint8)
    # a stem that CONTAINS the extension string: naive
    # replace(ext, 'npy') would corrupt the name
    Image.fromarray(arr).save(img_dir / "png_chart_0.png")
    trunk = extract_grid_feats.make_trunk(stages=(1, 1, 1, 1))
    written = extract_grid_feats.extract_dataset_pool5(
        str(img_dir), str(tmp_path / "o"), ext_filter="png",
        trunk=trunk)
    assert [os.path.basename(w) for w in written] == ["png_chart_0.npy"]
