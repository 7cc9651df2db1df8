"""Checkpoint ingestion: reference PyTorch state_dicts -> our param pytrees.

The reference auto-downloads jbetker's original tortoise-tts-v2 weights
(models/__init__.py:23-44); this module maps those state_dicts (loaded as
numpy via utils/io.py, no torch required at runtime) onto the functional
parameter layout used here.  Conventions (models/common.py):

- torch nn.Linear.weight (out,in)   -> ours (in,out)  [transpose]
- HF  Conv1D.weight      (in,out)   -> ours (in,out)  [as-is]
- torch nn.Conv1d.weight (out,in,k) -> ours (out,in,k) [as-is]
- norm .weight/.bias                -> scale/bias
- nn.Embedding.weight               -> w
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Any]


def _np(x) -> Array:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (cpu) — avoid importing torch at module level
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _lin(sd: StateDict, prefix: str, transpose: bool = True) -> Dict[str, Array]:
    w = _np(sd[prefix + ".weight"])
    p = {"w": w.T if transpose else w}
    if prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def _conv(sd: StateDict, prefix: str) -> Dict[str, Array]:
    p = {"w": _np(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd and sd[prefix + ".bias"] is not None:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def _norm(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def _emb(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"w": _np(sd[prefix + ".weight"])}


def _attention_block(sd: StateDict, prefix: str) -> Dict[str, Any]:
    p = {
        "norm": _norm(sd, prefix + ".norm"),
        "qkv": _conv(sd, prefix + ".qkv"),
        "proj_out": _conv(sd, prefix + ".proj_out"),
    }
    rel = prefix + ".relative_pos_embeddings.relative_attention_bias.weight"
    if rel in sd:
        p["rel_pos"] = {"w": _np(sd[rel])}
    return p


def _res_block_arch(sd: StateDict, prefix: str) -> Dict[str, Any]:
    """arch_utils.ResBlock: in_layers.{0 norm,2 conv}, out_layers.{0,3}."""
    p = {
        "in_norm": _norm(sd, prefix + ".in_layers.0"),
        "in_conv": _conv(sd, prefix + ".in_layers.2"),
        "out_norm": _norm(sd, prefix + ".out_layers.0"),
        "out_conv": _conv(sd, prefix + ".out_layers.3"),
    }
    if prefix + ".skip_connection.weight" in sd:
        p["skip"] = _conv(sd, prefix + ".skip_connection")
    return p


def convert_conditioning_encoder(sd: StateDict, prefix: str,
                                 attn_blocks: int = 6) -> Dict[str, Any]:
    dot = prefix + "." if prefix else ""
    return {
        "init": _conv(sd, dot + "init"),
        "attn": [_attention_block(sd, f"{dot}attn.{i}")
                 for i in range(attn_blocks)],
    }


# ---------------------------------------------------------------------------
# UnifiedVoice — reference unified_voice.py state_dict layout
# ---------------------------------------------------------------------------


def convert_unified_voice(sd: StateDict, layers: int = 30) -> Dict[str, Any]:
    def stack_lin(fmt: str, transpose: bool) -> Dict[str, Array]:
        ws, bs = [], []
        for i in range(layers):
            w = _np(sd[fmt.format(i) + ".weight"])
            ws.append(w.T if transpose else w)
            bs.append(_np(sd[fmt.format(i) + ".bias"]))
        return {"w": np.stack(ws), "b": np.stack(bs)}

    def stack_norm(fmt: str) -> Dict[str, Array]:
        return {"scale": np.stack([_np(sd[fmt.format(i) + ".weight"])
                                   for i in range(layers)]),
                "bias": np.stack([_np(sd[fmt.format(i) + ".bias"])
                                  for i in range(layers)])}

    gpt = {
        "ln_1": stack_norm("gpt.h.{}.ln_1"),
        # HF Conv1D: stored (in, out) already
        "attn_qkv": stack_lin("gpt.h.{}.attn.c_attn", transpose=False),
        "attn_proj": stack_lin("gpt.h.{}.attn.c_proj", transpose=False),
        "ln_2": stack_norm("gpt.h.{}.ln_2"),
        "mlp_fc": stack_lin("gpt.h.{}.mlp.c_fc", transpose=False),
        "mlp_proj": stack_lin("gpt.h.{}.mlp.c_proj", transpose=False),
        "ln_f": _norm(sd, "gpt.ln_f"),
    }
    return {
        "conditioning_encoder": convert_conditioning_encoder(
            sd, "conditioning_encoder"),
        "text_embedding": _emb(sd, "text_embedding"),
        "mel_embedding": _emb(sd, "mel_embedding"),
        "text_pos_embedding": _emb(sd, "text_pos_embedding.emb"),
        "mel_pos_embedding": _emb(sd, "mel_pos_embedding.emb"),
        "gpt": gpt,
        "final_norm": _norm(sd, "final_norm"),
        "text_head": _lin(sd, "text_head"),
        "mel_head": _lin(sd, "mel_head"),
    }
