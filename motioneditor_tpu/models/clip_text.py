"""CLIP text encoder (ViT-L/14 text tower) — the SD-1.5 prompt encoder.

Functional port of the CLIPTextModel the reference loads at inference.py:153.
Returns the final hidden states [B, 77, 768] (the reference always indexes
``text_encoder(ids)[0]``, e.g. null_text_optimization.py:98).

Tokenization: ``load_clip_tokenizer`` wraps the HF tokenizer from a local
SD-1.5 checkpoint directory (the reference's ``checkpoints/
stable-diffusion-v1-5/tokenizer``); ``StubTokenizer`` is a deterministic
hash-based stand-in for tests / environments without checkpoint files.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.models.layers import (
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    quick_gelu,
)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    bos_token_id: int = 49406
    eos_token_id: int = 49407


def init_clip_text(key, config: CLIPTextConfig = CLIPTextConfig()):
    c = config
    keys = iter(jax.random.split(key, 8 + 8 * c.num_layers))
    params = {
        "token_embedding": jax.random.normal(next(keys), (c.vocab_size, c.hidden_size)) * 0.02,
        "position_embedding": jax.random.normal(
            next(keys), (c.max_position_embeddings, c.hidden_size)
        )
        * 0.01,
        "layers": [],
        "final_layer_norm": init_layer_norm(c.hidden_size),
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "layer_norm1": init_layer_norm(c.hidden_size),
                "q_proj": init_linear(next(keys), c.hidden_size, c.hidden_size),
                "k_proj": init_linear(next(keys), c.hidden_size, c.hidden_size),
                "v_proj": init_linear(next(keys), c.hidden_size, c.hidden_size),
                "out_proj": init_linear(next(keys), c.hidden_size, c.hidden_size),
                "layer_norm2": init_layer_norm(c.hidden_size),
                "fc1": init_linear(next(keys), c.hidden_size, c.intermediate_size),
                "fc2": init_linear(next(keys), c.intermediate_size, c.hidden_size),
            }
        )
    return params


def clip_text_apply(
    params, input_ids: jnp.ndarray, config: CLIPTextConfig = CLIPTextConfig()
) -> jnp.ndarray:
    """input_ids: [B, 77] int32 -> last hidden state [B, 77, 768]."""
    c = config
    b, t = input_ids.shape
    x = params["token_embedding"][input_ids] + params["position_embedding"][None, :t]

    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    heads = c.num_heads
    dim_head = c.hidden_size // heads
    scale = dim_head**-0.5

    for lp in params["layers"]:
        h = layer_norm(lp["layer_norm1"], x, eps=c.layer_norm_eps)
        q = linear(lp["q_proj"], h).reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        k = linear(lp["k_proj"], h).reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        v = linear(lp["v_proj"], h).reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * scale + causal
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, c.hidden_size)
        x = x + linear(lp["out_proj"], attn)

        h = layer_norm(lp["layer_norm2"], x, eps=c.layer_norm_eps)
        x = x + linear(lp["fc2"], quick_gelu(linear(lp["fc1"], h)))

    return layer_norm(params["final_layer_norm"], x, eps=c.layer_norm_eps)


def clip_text_embed(
    params, input_ids: jnp.ndarray, config: CLIPTextConfig = CLIPTextConfig()
) -> jnp.ndarray:
    """Pooled + projected text embedding for CLIP-score evaluation.

    Pooled state = hidden state at the EOT token (highest token id, CLIP
    convention); projected through ``text_projection`` when present (openai
    CLIP checkpoints have it; SD's text_encoder subfolder does not)."""
    hidden = clip_text_apply(params, input_ids, config)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = jnp.take_along_axis(hidden, eot[:, None, None], axis=1)[:, 0]
    if "text_projection" in params:
        pooled = pooled @ params["text_projection"]["kernel"].astype(pooled.dtype)
    return pooled


# ---------------------------------------------------------------------------
# tokenizers
# ---------------------------------------------------------------------------


def load_clip_tokenizer(pretrained_model_path: str):
    """HF CLIPTokenizer from a local SD checkpoint dir (subfolder tokenizer),
    mirroring inference.py:152."""
    from transformers import CLIPTokenizer

    return CLIPTokenizer.from_pretrained(pretrained_model_path, subfolder="tokenizer")


class StubTokenizer:
    """Deterministic word-hash tokenizer for tests (no vocab files needed).

    Mimics the CLIPTokenizer call surface used by the pipeline: pads to
    model_max_length with EOS after a BOS-prefixed word-id sequence.
    """

    model_max_length = 77
    bos_token_id = 49406
    eos_token_id = 49407

    def __init__(self):
        self._inv = {self.bos_token_id: "", self.eos_token_id: ""}

    def encode(self, text: str) -> List[int]:
        words = [w for w in text.lower().strip().split(" ") if w]
        ids = [self.bos_token_id]
        for w in words:
            wid = (hash(w) % 49000) + 320
            self._inv[wid] = w
            ids.append(wid)
        ids.append(self.eos_token_id)
        return ids

    def decode(self, ids) -> str:
        """Inverse of encode for ids seen by this instance — enough for the
        p2p get_word_inds/seq_aligner surface (ptp_utils.py:281-299)."""
        if isinstance(ids, int):
            ids = [ids]
        return "".join(self._inv.get(int(i), "?") for i in ids)

    def __call__(self, texts, max_length=77, padding="max_length", truncation=True,
                 return_tensors=None, **kw):
        if isinstance(texts, str):
            texts = [texts]
        out = []
        for t in texts:
            ids = self.encode(t)[:max_length]
            ids = ids + [self.eos_token_id] * (max_length - len(ids))
            out.append(ids)
        arr = np.asarray(out, np.int32)

        class _Res:
            input_ids = arr

        return _Res()


def tokenize(tokenizer, texts: Sequence[str], max_length: int = 77) -> jnp.ndarray:
    res = tokenizer(
        list(texts), max_length=max_length, padding="max_length", truncation=True
    )
    return jnp.asarray(np.asarray(res.input_ids), jnp.int32)
