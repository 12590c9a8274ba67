"""MMBTGridHMInterface (C34, mmf/models/interfaces/mmbt.py):
end-to-end classify() on a tiny config."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu.models import encoders as E  # noqa: E402
from transformer_mm_explainability_tpu.models import interfaces as I  # noqa: E402
from transformer_mm_explainability_tpu.models import mmbt as jmmbt  # noqa: E402
from transformer_mm_explainability_tpu.data import processors as P  # noqa: E402

VOCAB = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4,
         "a": 5, "meme": 6, "text": 7}


@pytest.fixture(scope="module")
def interface():
    cfg = jmmbt.MMBTConfig(vocab_size=len(VOCAB), hidden_size=16,
                           num_hidden_layers=2, num_attention_heads=2,
                           modal_hidden_size=2048)
    enc = E.ResNet152ImageEncoder({"num_output_features": 1})
    params = {
        "mmbt": jmmbt.init_mmbt(jax.random.PRNGKey(0), cfg),
        "image_encoder": enc.init(jax.random.PRNGKey(1)),
    }
    text_proc = P.BertTokenizerProcessor(
        {"tokenizer_config": {"vocab": VOCAB}, "max_seq_length": 8})
    return I.MMBTGridHMInterface(params, cfg, text_proc,
                                 image_encoder=enc)


def test_classify_array(interface):
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255
           ).astype(np.uint8)
    out = interface.classify(img, "a meme text")
    assert out["label"] in (0, 1)
    assert 0.0 <= out["confidence"] <= 1.0


def test_classify_path(interface, tmp_path):
    from PIL import Image
    arr = (np.random.RandomState(1).rand(64, 64, 3) * 255
           ).astype(np.uint8)
    p = tmp_path / "meme.png"
    Image.fromarray(arr).save(p)
    out = interface.classify(str(p), "a meme")
    assert out["label"] in (0, 1)
    with pytest.raises(RuntimeError, match="offline"):
        interface.classify("http://example.com/x.png", "a meme")
