"""Textual inversion: inject learned token embeddings into tokenizer + CLIP.

Functional equivalent of the reference's textual-inversion hook in
``load_third_party_checkpoints`` (/root/reference/live2diff/animatediff/
converter/convert.py:64-96): each TI file carries one or more embedding
vectors; we append them to the vocab and to the token-embedding matrix as a
pure parameter transform.

Supported file layouts: {"emb_params": [n, 768]}, {"string_to_param":
{"*": [n, 768]}}, or a flat {token: [768]} dict.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def extract_ti_embeddings(sd: Dict[str, np.ndarray], token: str) -> List[Tuple[str, np.ndarray]]:
    """-> [(token_name, vector)], multi-vector embeddings get numbered tokens."""
    if "emb_params" in sd:
        vecs = np.asarray(sd["emb_params"])
    elif "string_to_param" in sd:
        vecs = np.asarray(next(iter(sd["string_to_param"].values())))
    else:
        flat = {k: np.asarray(v) for k, v in sd.items() if np.asarray(v).ndim in (1, 2)}
        if len(flat) == 1:
            vecs = next(iter(flat.values()))
        else:
            return [(k, np.atleast_2d(v)[0]) for k, v in flat.items()]
    vecs = np.atleast_2d(vecs)
    if len(vecs) == 1:
        return [(token, vecs[0])]
    return [(f"{token}_{i}", v) for i, v in enumerate(vecs)]


def apply_textual_inversion(
    tokenizer, clip_params: dict, sd: Dict[str, np.ndarray], token: str
) -> Tuple[object, dict]:
    """Returns (tokenizer, clip_params) with the new tokens registered.

    clip_params layout: {"params": {"text_model": {"token_embedding":
    {"embedding": [V, D]}}, ...}} — the embedding matrix grows by the number
    of injected vectors; callers must rebuild anything cached on vocab size.
    """
    pairs = extract_ti_embeddings(sd, token)
    emb_node = clip_params["params"]["text_model"]["token_embedding"]
    table = np.asarray(emb_node["embedding"])
    new_rows = []
    for name, vec in pairs:
        if name in tokenizer.encoder:
            continue
        tokenizer.add_token(name.lower(), len(tokenizer.encoder))
        new_rows.append(np.asarray(vec, dtype=table.dtype))
    if new_rows:
        table = np.concatenate([table, np.stack(new_rows)], axis=0)
        emb_node["embedding"] = table
    return tokenizer, clip_params
