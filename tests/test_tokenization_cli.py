"""WordPiece tokenizer + CLI smoke tests."""

import json
import subprocess
import sys

import numpy as np
import pytest

from transformer_mm_explainability_tpu.data.tokenization import (
    BertTokenizer, basic_tokenize)

VOCAB = {t: i for i, t in enumerate(
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]",
     "what", "is", "the", "dog", "do", "##ing", "?", "play", "##ing.",
     "frisbee", "a", "cat", "run", "##n", "##ing"])}


def test_basic_tokenize():
    assert basic_tokenize("What is THE dog doing?") == \
        ["what", "is", "the", "dog", "doing", "?"]
    assert basic_tokenize("héllo!") == ["hello", "!"]


def test_wordpiece_greedy():
    tok = BertTokenizer(vocab=VOCAB)
    ids = tok.tokenize_ids("what is the dog doing?")
    toks = [tok.inv[i] for i in ids]
    assert toks == ["what", "is", "the", "dog", "do", "##ing", "?"]
    # unknown word → [UNK]
    assert tok.tokenize_ids("zebra") == [tok.unk]


def test_encode_vqa():
    tok = BertTokenizer(vocab=VOCAB)
    enc = tok.encode_vqa("what is the dog doing?", max_len=16)
    assert enc["input_ids"].shape == (16,)
    n = enc["input_mask"].sum()
    assert enc["input_ids"][0] == tok.cls
    assert enc["input_ids"][n - 1] == tok.sep
    # the VQA pooling token (input_mask.sum - 2) is the final question
    # token — '?'
    assert tok.inv[int(enc["input_ids"][n - 2])] == "?"
    assert (enc["input_ids"][n:] == tok.pad).all()


def test_wordpiece_parity_with_hf():
    """Cross-check against transformers' WordPiece when a vocab is
    constructible (uses HF's BertTokenizer on our tiny vocab)."""
    transformers = pytest.importorskip("transformers")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vocab.txt")
        with open(path, "w") as f:
            f.write("\n".join(VOCAB.keys()) + "\n")
        hf = transformers.BertTokenizer(path, do_lower_case=True)
        ours = BertTokenizer(vocab_path=path)
        for text in ("what is the dog doing?", "a cat running",
                     "frisbee frisbee?"):
            want = hf.encode(text)
            got = [ours.cls] + ours.tokenize_ids(text) + [ours.sep]
            assert got == want, text


def test_cli_perturbation_smoke():
    """The CLI perturbation path runs end-to-end in smoke mode."""
    from transformer_mm_explainability_tpu import cli

    rc = cli.main([
        "perturbation", "--model", "visual_bert", "--method", "ours_no_lrp",
        "--num-samples", "2", "--is-positive-pert", "true",
        "--is-text-pert", "false",
    ])
    assert rc == 0


def test_cli_parser_reference_flags():
    from transformer_mm_explainability_tpu import cli

    p = cli.build_parser()
    a = p.parse_args([
        "perturbation", "--method", "transformer_att",
        "--num-samples", "100", "--is-text-pert", "true",
        "--is-positive-pert", "false", "training.batch_size=1",
    ])
    assert a.method == "transformer_att"
    assert a.is_text_pert is True
    assert a.is_positive_pert is False
    assert a.opts == ["training.batch_size=1"]
