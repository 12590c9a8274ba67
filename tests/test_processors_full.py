"""Full processor registry (C29): parity vs the in-process reference
processors (VisualBERT/mmf/datasets/processors/processors.py with the
real mmf registry/VocabDict/BaseVocab loaded, torchtext/omegaconf
stubbed) plus hand oracles for the offline-only embedding paths."""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

jax = pytest.importorskip("jax")

from transformer_mm_explainability_tpu.data import processors as P  # noqa: E402
from transformer_mm_explainability_tpu.core.registry import registry  # noqa: E402


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _load_real(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, str(REFERENCE / "VisualBERT" / relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class AttrDict(dict):
    """Stands in for OmegaConf DictConfig: attr access + .get."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return AttrDict(v) if isinstance(v, dict) else v

    def __contains__(self, k):
        return dict.__contains__(self, k)


@pytest.fixture(scope="module")
def ref(request):
    import torch  # noqa: F401

    added = []

    def add(name, mod):
        assert name not in sys.modules, name
        sys.modules[name] = mod
        added.append(name)

    for pkg in ("VisualBERT", "VisualBERT.mmf", "VisualBERT.mmf.common",
                "VisualBERT.mmf.utils", "VisualBERT.mmf.datasets",
                "VisualBERT.mmf.datasets.processors"):
        add(pkg, _stub_module(pkg))

    class _PathManager:
        @staticmethod
        def open(*a, **k):
            return open(*a, **k)

        @staticmethod
        def exists(p):
            import os
            return os.path.exists(p)

        @staticmethod
        def isfile(p):
            import os
            return os.path.isfile(p)

    add("VisualBERT.mmf.utils.env",
        _stub_module("VisualBERT.mmf.utils.env",
                     setup_imports=lambda *a, **k: None))
    add("VisualBERT.mmf.utils.file_io",
        _stub_module("VisualBERT.mmf.utils.file_io",
                     PathManager=_PathManager))
    add("VisualBERT.mmf.utils.general",
        _stub_module("VisualBERT.mmf.utils.general",
                     get_absolute_path=lambda p: p))
    add("VisualBERT.mmf.utils.configuration",
        _stub_module("VisualBERT.mmf.utils.configuration",
                     get_mmf_cache_dir=lambda: "/tmp",
                     get_mmf_env=lambda key=None: "/tmp"))
    add("VisualBERT.mmf.utils.distributed",
        _stub_module("VisualBERT.mmf.utils.distributed",
                     is_master=lambda: True,
                     synchronize=lambda *a, **k: None))
    add("torchtext", _stub_module("torchtext", vocab=None))
    add("VisualBERT.mmf.common.typings",
        _stub_module("VisualBERT.mmf.common.typings",
                     ProcessorConfigType=object))

    class _Sample(dict):
        pass

    add("VisualBERT.mmf.common.sample",
        _stub_module("VisualBERT.mmf.common.sample", Sample=_Sample,
                     SampleList=list))
    add("VisualBERT.mmf.utils.dataset",
        _stub_module("VisualBERT.mmf.utils.dataset",
                     build_bbox_tensors=lambda infos, L: (infos, L)))

    registry_mod = _load_real("VisualBERT.mmf.common.registry",
                              "mmf/common/registry.py")
    added.append("VisualBERT.mmf.common.registry")
    text = _load_real("VisualBERT.mmf.utils.text", "mmf/utils/text.py")
    added.append("VisualBERT.mmf.utils.text")
    vocab = _load_real("VisualBERT.mmf.utils.vocab", "mmf/utils/vocab.py")
    added.append("VisualBERT.mmf.utils.vocab")
    procs = _load_real("VisualBERT.mmf.datasets.processors.processors",
                       "mmf/datasets/processors/processors.py")
    added.append("VisualBERT.mmf.datasets.processors.processors")

    ns = types.SimpleNamespace(procs=procs, text=text, vocab=vocab,
                               registry=registry_mod.registry)

    def cleanup():
        for name in added:
            sys.modules.pop(name, None)

    request.addfinalizer(cleanup)
    return ns


VOCAB_WORDS = ["the", "cat", "sat", "on", "mat", "two", "dogs"]
ANSWER_WORDS = ["<pad>", "<s>", "</s>", "<unk>", "yes", "no", "two",
                "dogs", "red"]


@pytest.fixture()
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB_WORDS) + "\n")
    return str(p)


@pytest.fixture()
def answer_vocab_file(tmp_path):
    p = tmp_path / "answers.txt"
    p.write_text("\n".join(ANSWER_WORDS) + "\n")
    return str(p)


@requires_reference
def test_vocab_processor_parity(ref, vocab_file):
    want_p = ref.procs.VocabProcessor(AttrDict(
        vocab={"type": "random", "vocab_file": vocab_file},
        max_length=6))
    got_p = P.VocabProcessor({"vocab": {"vocab_file": vocab_file},
                              "max_length": 6})
    item = {"tokens": ["the", "cat", "sat", "on", "zebra"]}
    want = want_p(dict(item))
    got = got_p(dict(item))
    np.testing.assert_array_equal(np.asarray(got["text"]),
                                  want["text"].numpy())
    assert got["tokens"] == want["tokens"]
    assert int(got["length"]) == int(want["length"])
    assert got_p.get_vocab_size() == want_p.get_vocab_size()
    assert got_p.get_pad_index() == want_p.get_pad_index()


@requires_reference
def test_caption_processor_parity(ref, vocab_file):
    cfg_ref = AttrDict(vocab={"type": "random", "vocab_file": vocab_file})
    want_p = ref.procs.CaptionProcessor(cfg_ref)
    got_p = P.CaptionProcessor({"vocab": {"vocab_file": vocab_file}})
    # ids: SOS(1) the(4) cat(5) EOS(2) pad(0) — specials stripped
    ids = [1, 4, 5, 2, 0, 0]
    want = want_p(list(ids))
    got = got_p(list(ids))
    assert got["tokens"] == want["tokens"]
    assert got["caption"] == want["caption"]


@requires_reference
def test_soft_copy_answer_parity(ref, answer_vocab_file):
    cfg = AttrDict(vocab_file=answer_vocab_file, num_answers=10,
                   max_length=5,
                   preprocessor={"type": "simple_word", "params": {}})
    want_p = ref.procs.SoftCopyAnswerProcessor(cfg)
    got_p = P.SoftCopyAnswerProcessor({"vocab_file": answer_vocab_file,
                                       "num_answers": 10,
                                       "max_length": 5,
                                       "preprocessor": "simple_word"})
    answers = ["two dogs", "two dogs", "dogs", "red", "two dogs", "red",
               "dogs", "two dogs", "red", "no"]
    tokens = ["red", "dogs", "sign", "two dogs", "no"]
    want = want_p({"answers": list(answers), "tokens": list(tokens)})
    got = got_p({"answers": list(answers), "tokens": list(tokens)})
    np.testing.assert_allclose(got["answers_scores"],
                               want["answers_scores"].numpy(),
                               atol=1e-6)
    assert got_p.get_vocab_size() == want_p.get_vocab_size()
    assert got_p.get_true_vocab_size() == want_p.get_true_vocab_size()


@requires_reference
def test_m4c_answer_processor_parity(ref, answer_vocab_file):
    """Deterministic case: every answer yields at most one decoding
    sequence, so the reference's global np.random.choice and our
    RandomState pick the same (only) element."""
    cfg = AttrDict(vocab_file=answer_vocab_file,
                   preprocessor={"type": "simple_word", "params": {}},
                   num_answers=10, max_length=4, max_copy_steps=4)
    want_p = ref.procs.M4CAnswerProcessor(cfg)
    got_p = P.M4CAnswerProcessor({
        "vocab_file": answer_vocab_file,
        "preprocessor": {"type": "simple_word", "params": {}},
        "num_answers": 10, "max_length": 4, "max_copy_steps": 4})
    # all answers identical → a single candidate decoding sequence, so
    # the reference's global np.random.choice and ours must agree
    answers = ["yes"] * 10
    item = {"answers": list(answers), "tokens": ["street", "sign"]}
    np.random.seed(11)
    want = want_p({"answers": list(answers),
                   "tokens": ["street", "sign"]})
    got = got_p(dict(item))
    np.testing.assert_allclose(got["answers_scores"],
                               want["answers_scores"].numpy(), atol=1e-6)
    np.testing.assert_array_equal(got["train_prev_inds"],
                                  want["train_prev_inds"].numpy())
    np.testing.assert_array_equal(got["train_loss_mask"],
                                  want["train_loss_mask"].numpy())
    assert got["sampled_idx_seq"] == tuple(want["sampled_idx_seq"])
    # copy-pointer path: answer matched through OCR tokens
    item2 = {"answers": ["street sign"] * 10,
             "tokens": ["street", "sign"]}
    np.random.seed(12)
    want2 = want_p({"answers": ["street sign"] * 10,
                    "tokens": ["street", "sign"]})
    got2 = got_p(dict(item2))
    np.testing.assert_allclose(got2["answers_scores"],
                               want2["answers_scores"].numpy(),
                               atol=1e-6)
    np.testing.assert_array_equal(got2["train_prev_inds"],
                                  want2["train_prev_inds"].numpy())


@requires_reference
def test_m4c_caption_tokenize_parity(ref, answer_vocab_file):
    cfg = AttrDict(vocab_file=answer_vocab_file,
                   preprocessor={"type": "simple_word", "params": {}},
                   num_answers=1, max_length=4, max_copy_steps=4)
    want_p = ref.procs.M4CCaptionProcessor(cfg)
    got_p = P.M4CCaptionProcessor({
        "vocab_file": answer_vocab_file,
        "preprocessor": {"type": "simple_word", "params": {}},
        "num_answers": 1, "max_length": 4, "max_copy_steps": 4})
    s = "Two dogs, on the mat's edge?"
    assert got_p.tokenize(s) == want_p.tokenize(s)
    assert got_p.compute_answer_scores(["a", "b", "a"]) \
        == want_p.compute_answer_scores(["a", "b", "a"])
    assert got_p.match_answer_to_unk and want_p.match_answer_to_unk


def test_masked_region_deterministic_edges():
    full = P.MaskedRegionProcessor({"mask_probability": 1.0,
                                    "mask_region_probability": 1.0})
    feats = np.ones((5, 3), np.float32)
    labels = full(feats)
    assert (labels == 1).all() and (feats == 0).all()
    none = P.MaskedRegionProcessor({"mask_probability": 0.0})
    feats = np.ones((5, 3), np.float32)
    labels = none(feats)
    assert (labels == -1).all() and (feats == 1).all()


def test_glove_and_fasttext_offline(tmp_path, vocab_file):
    emb = tmp_path / "emb.txt"
    emb.write_text("the 1.0 0.0\ncat 0.5 0.5\nmat 0.0 2.0\n")
    g = P.GloVeProcessor({"vocab": {"vocab_file": vocab_file,
                                    "embedding_file": str(emb)},
                          "max_length": 4})
    out = g({"tokens": ["cat", "zebra", "the"]})["text"]
    np.testing.assert_allclose(out[0], [0.5, 0.5])
    np.testing.assert_allclose(out[1], [0.0, 0.0])  # OOV → zeros
    np.testing.assert_allclose(out[2], [1.0, 0.0])
    np.testing.assert_allclose(out[3], [0.0, 0.0])  # pad
    with pytest.raises(AttributeError):
        P.GloVeProcessor({"vocab": {"vocab_file": vocab_file},
                          "max_length": 4})

    ft = P.FastTextProcessor({"model_file": str(emb), "max_length": 3})
    out = ft({"tokens": ["mat", "unknown"]})["text"]
    np.testing.assert_allclose(out[0], [0.0, 2.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0])


def test_phoc_processor_matches_native():
    from transformer_mm_explainability_tpu import native
    p = P.PhocProcessor({"max_length": 3})
    out = p({"tokens": ["cat", "dog"]})["text"]
    assert out.shape == (3, 604)
    np.testing.assert_allclose(out[0], native.build_phoc("cat"))
    np.testing.assert_allclose(out[1], native.build_phoc("dog"))
    np.testing.assert_allclose(out[2], 0.0)


def test_copy_bbox_multiclass_argmax(tmp_path):
    c = P.CopyProcessor({"max_length": 4})
    blob = np.arange(6, dtype=np.float32).reshape(2, 3)
    out = c({"blob": blob})["blob"]
    assert out.shape == (4, 3)
    np.testing.assert_allclose(out[:2], blob)
    np.testing.assert_allclose(out[2:], 0)

    b = P.BBoxProcessor({"max_length": 2})
    bbox = b({"info": [{"bounding_box": {
        "top_left_x": 10, "top_left_y": 20, "width": 30,
        "height": 40}}]})["bbox"]
    np.testing.assert_allclose(bbox["coordinates"][0], [10, 20, 40, 60])
    assert bbox["bbox_types"] == ["xyxy", "xyxy"]

    vf = tmp_path / "labels.txt"
    vf.write_text("<unk>\nhateful\nnot_hateful\n")
    m = P.MultiClassFromFile({"vocab_file": str(vf)})
    assert int(m("hateful")["class_index"]) == 0
    assert int(m({"label": "not_hateful"})["class_index"]) == 1
    with pytest.raises(AssertionError):
        m("missing_label")

    a = P.ArgMaxPredictionProcessor({})
    preds = a({"scores": np.asarray([[0.1, 0.9], [0.8, 0.2]]),
               "id": [7, 8]})
    assert preds == [{"id": 7, "answer": 1}, {"id": 8, "answer": 0}]


def test_image_processors():
    g = P.GrayScaleTo3Channels()
    x = np.ones((1, 4, 4), np.float32)
    assert g(x).shape == (3, 4, 4)
    assert g({"image": x})["image"].shape == (3, 4, 4)

    t = P.TorchvisionTransforms({"transforms": [
        "ToTensor",
        {"type": "Normalize", "params": {"mean": [0.5, 0.5, 0.5],
                                         "std": [0.5, 0.5, 0.5]}},
        {"type": "GrayScaleTo3Channels", "params": {}},
    ]})
    img = np.full((1, 2, 2), 255, np.uint8)
    out = t(img)
    assert out.shape == (3, 2, 2)
    np.testing.assert_allclose(out, 1.0)


def test_multi_sentence_bert_tokenizer():
    vocab = {"[PAD]": 0, "[UNK]": 100, "[CLS]": 101, "[SEP]": 102,
             "[MASK]": 103, "hello": 5, "world": 6}
    p = P.MultiSentenceBertTokenizer({
        "tokenizer_config": {"vocab": vocab}, "max_seq_length": 6})
    out = p({"text": ["hello", "world hello"]})
    assert out["input_ids"].shape == (12,)  # concat fusion
    seg = out["segment_ids"].reshape(2, 6)
    assert (seg[0] == 0).all() and (seg[1] == 1).all()
    ids = out["input_ids"].reshape(2, 6)
    assert ids[0][0] == 101 and ids[1][0] == 101


def test_processor_wrapper_and_registry():
    for name in ("vocab", "glove", "fasttext", "soft_copy_answer",
                 "bbox", "caption", "evalai_answer", "phoc", "copy",
                 "m4c_answer", "m4c_caption", "masked_region",
                 "multi_class_from_file",
                 "multi_sentence_bert_tokenizer", "GrayScaleTo3Channels",
                 "torchvision_transforms", "prediction.argmax"):
        assert registry.get("processor", name) is not None, name
    w = P.Processor({"type": "simple_word"})
    assert w({"text": "Hello?"})["text"] == "hello"
    with pytest.raises(AttributeError):
        P.Processor({"params": {}})
