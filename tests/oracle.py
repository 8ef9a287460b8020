"""Independent numpy float64 reference model (the numerics oracle).

Deliberately written in a different style from metalchat_tpu.models:
per-layer Python loops over HF-named [out, in]-major tensors, explicit KV
head repetition (the reference's repeat_interleave, transform.h:80-90),
naive stable softmax. Plays the role the reference's src/reference.cc CPU
path plays for its Metal kernels (BASELINE.md config 1).
"""

from __future__ import annotations

import numpy as np


def rms_norm(x, w, eps, mu=0.0):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(var + eps)) * (mu + w)


def rope_tables(head_dim, max_seq, theta, scaling=None):
    freqs = 1.0 / theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    if scaling is not None:
        lo = scaling.original_max_position_embeddings / scaling.low_freq_factor
        hi = scaling.original_max_position_embeddings / scaling.high_freq_factor
        out = []
        for f in freqs:
            wl = 2 * np.pi / f
            if wl < hi:
                out.append(f)
            elif wl > lo:
                out.append(f / scaling.factor)
            else:
                sm = (scaling.original_max_position_embeddings / wl - scaling.low_freq_factor) / (
                    scaling.high_freq_factor - scaling.low_freq_factor
                )
                out.append((1 - sm) * f / scaling.factor + sm * f)
        freqs = np.array(out)
    ang = np.outer(np.arange(max_seq), freqs)
    return np.cos(ang), np.sin(ang)


def apply_rope(x, cos, sin, positions):
    # x: [B, S, n, hd]; positions: [S]
    c = cos[positions][None, :, None, :]
    s = sin[positions][None, :, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def silu(x):
    return x / (1.0 + np.exp(-x))


def gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def forward(tensors, cfg, tokens, start_pos=0, kv_state=None):
    """tensors: HF-named {name: np [out,in]}; tokens: [B, S] int.

    kv_state: optional dict layer→(k_list, v_list) of previously seen
    positions; mutated in place to emulate the KV cache.
    Returns float64 logits [B, S, V].
    """
    B, S = tokens.shape
    H = cfg.hidden_size
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    positions = np.arange(start_pos, start_pos + S)

    x = tensors["model.embed_tokens.weight"].astype(np.float64)[tokens]
    if cfg.embedding_scale is not None:
        x = x * cfg.embedding_scale

    cos_g, sin_g = rope_tables(hd, cfg.max_seq_len, cfg.rope_theta, cfg.rope_scaling)
    if cfg.rope_local_theta is not None:
        cos_l, sin_l = rope_tables(hd, cfg.max_seq_len, cfg.rope_local_theta)

    if kv_state is None:
        kv_state = {}

    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        w = lambda n: tensors[p + n].astype(np.float64)  # noqa: E731
        mu = cfg.norm_weight_offset
        h = rms_norm(x, w("input_layernorm.weight"), cfg.rms_norm_eps, mu)
        q = h @ w("self_attn.q_proj.weight").T
        k = h @ w("self_attn.k_proj.weight").T
        v = h @ w("self_attn.v_proj.weight").T
        q = q.reshape(B, S, nh, hd)
        k = k.reshape(B, S, nkv, hd)
        v = v.reshape(B, S, nkv, hd)
        if cfg.use_qk_norm:
            q = rms_norm(q, w("self_attn.q_norm.weight"), cfg.rms_norm_eps, mu)
            k = rms_norm(k, w("self_attn.k_norm.weight"), cfg.rms_norm_eps, mu)

        is_global = cfg.layer_is_global(i)
        if cfg.rope_local_theta is not None and not is_global:
            cos, sin = cos_l, sin_l
        else:
            cos, sin = cos_g, sin_g
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)

        if i in kv_state:
            pk, pv = kv_state[i]
            k_all = np.concatenate([pk, k], axis=1)
            v_all = np.concatenate([pv, v], axis=1)
        else:
            k_all, v_all = k, v
        kv_state[i] = (k_all, v_all)
        T = k_all.shape[1]

        # Explicit KV head repetition (reference repeat_interleave).
        reps = nh // nkv
        k_rep = np.repeat(k_all, reps, axis=2)  # [B, T, nh, hd]
        v_rep = np.repeat(v_all, reps, axis=2)

        scale = cfg.query_scale if cfg.query_scale is not None else hd**-0.5
        scores = np.einsum("bsnd,btnd->bnst", q, k_rep) * scale
        kv_pos = np.arange(T)
        allowed = kv_pos[None, :] <= positions[:, None]
        if cfg.sliding_window is not None and not is_global:
            allowed &= kv_pos[None, :] > positions[:, None] - cfg.sliding_window
        scores = np.where(allowed[None, None], scores, -1e30)
        probs = softmax(scores)
        attn = np.einsum("bnst,btnd->bsnd", probs, v_rep).reshape(B, S, nh * hd)
        attn = attn @ w("self_attn.o_proj.weight").T
        if cfg.use_post_norms:
            attn = rms_norm(attn, w("post_attention_layernorm.weight"), cfg.rms_norm_eps, mu)
        x = x + attn

        ffn_norm_name = (
            "pre_feedforward_layernorm.weight" if cfg.use_post_norms
            else "post_attention_layernorm.weight"
        )
        h = rms_norm(x, w(ffn_norm_name), cfg.rms_norm_eps, mu)
        gate = h @ w("mlp.gate_proj.weight").T
        act = silu(gate) if cfg.hidden_act == "silu" else gelu_tanh(gate)
        f = (act * (h @ w("mlp.up_proj.weight").T)) @ w("mlp.down_proj.weight").T
        if cfg.use_post_norms:
            f = rms_norm(f, w("post_feedforward_layernorm.weight"), cfg.rms_norm_eps, mu)
        x = x + f

    x = rms_norm(x, tensors["model.norm.weight"].astype(np.float64), cfg.rms_norm_eps,
                 cfg.norm_weight_offset)
    if "lm_head.weight" in tensors:
        head = tensors["lm_head.weight"].astype(np.float64).T
    else:
        head = tensors["model.embed_tokens.weight"].astype(np.float64).T
    return x @ head
