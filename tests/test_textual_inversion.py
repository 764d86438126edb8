import numpy as np

from live2diff_tpu.convert.textual_inversion import (
    apply_textual_inversion,
    extract_ti_embeddings,
)
from live2diff_tpu.utils.tokenizer import CLIPTokenizer
import pytest

pytestmark = pytest.mark.fast


def test_extract_layouts():
    v = np.ones((2, 8), np.float32)
    assert len(extract_ti_embeddings({"emb_params": v}, "<tok>")) == 2
    assert len(extract_ti_embeddings({"string_to_param": {"*": v[:1]}}, "<tok>")) == 1
    assert extract_ti_embeddings({"string_to_param": {"*": v[:1]}}, "<tok>")[0][0] == "<tok>"


def test_apply_grows_vocab_and_table():
    tok = CLIPTokenizer.tiny()
    vocab_before = len(tok.encoder)
    table = np.zeros((vocab_before, 8), np.float32)
    clip_params = {"params": {"text_model": {"token_embedding": {"embedding": table}}}}
    tok, clip_params = apply_textual_inversion(
        tok, clip_params, {"emb_params": np.ones((2, 8), np.float32)}, "<style>"
    )
    assert len(tok.encoder) == vocab_before + 2
    new_table = clip_params["params"]["text_model"]["token_embedding"]["embedding"]
    assert new_table.shape == (vocab_before + 2, 8)
    np.testing.assert_array_equal(new_table[-1], 1.0)
    # the injected token must tokenize to its own id
    ids = tok(["<style>_0"])
    assert tok.encoder["<style>_0"] in ids[0]
