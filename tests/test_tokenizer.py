"""CLIP BPE tokenizer parity vs the reference SimpleTokenizer."""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

from transformer_mm_explainability_tpu.data import bpe

TEXTS = [
    "a dog",
    "a photo of a cat sitting on the mat.",
    "an elephant",
    "The QUICK brown fox: jumped over 123 lazy dogs!!",
    "it's a basset hound, isn't it?",
]


@pytest.fixture(scope="module")
def ref_tokenizer():
    # the reference module imports ftfy (absent) — stub it; its
    # fix_text only matters for mojibake, not these ASCII prompts.
    # The shim gets a real ModuleSpec (importlib.util.find_spec, which
    # transformers runs on fresh imports, raises ValueError on a module
    # whose __spec__ is None) and is removed again after this module's
    # tests, so test order can't leak it into other modules.
    import importlib.machinery
    import importlib.util

    added = False
    if "ftfy" not in sys.modules:
        shim = types.ModuleType("ftfy")
        shim.fix_text = lambda s: s
        shim.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
        sys.modules["ftfy"] = shim
        added = True

    spec = importlib.util.spec_from_file_location(
        "ref_simple_tokenizer",
        str(REFERENCE / "CLIP/clip/simple_tokenizer.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod.SimpleTokenizer()
    if added:
        sys.modules.pop("ftfy", None)


@requires_reference
def test_encode_parity(ref_tokenizer):
    tok = bpe.ClipTokenizer()
    for text in TEXTS:
        want = ref_tokenizer.encode(text.lower())
        got = tok.encode(text)
        assert got == list(want), f"{text!r}: {got} != {want}"


@requires_reference
def test_tokenize_batch(ref_tokenizer):
    out = bpe.tokenize(TEXTS)
    assert out.shape == (len(TEXTS), 77)
    tok = bpe.ClipTokenizer()
    for i, text in enumerate(TEXTS):
        ids = [tok.sot] + list(ref_tokenizer.encode(text.lower())) + [tok.eot]
        np.testing.assert_array_equal(out[i, :len(ids)], ids)
        assert (out[i, len(ids):] == 0).all()
    # EOT is the argmax (the pooling contract of encode_text)
    assert (out.argmax(-1) == (out != 0).sum(-1) - 1).all()


def test_decode_roundtrip():
    tok = bpe.ClipTokenizer()
    ids = tok.encode("a photo of a cat")
    assert tok.decode(ids).strip() == "a photo of a cat"


def test_truncate():
    long = "word " * 100
    with pytest.raises(RuntimeError):
        bpe.tokenize(long)
    out = bpe.tokenize(long, truncate=True)
    tok = bpe.ClipTokenizer()
    assert out[0, -1] == tok.eot
