"""metalchat_tpu — a TPU-native quantized LLM inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
metalchat reference (C++/Metal, single Apple-Silicon device): safetensors /
HuggingFace weight loading, BPE/tiktoken/SentencePiece tokenization, Llama-3 /
Gemma-3 decode with GQA attention + RoPE + KV caching, top-k/top-p/multinomial
sampling, INT8/INT4 weight-only blockwise quantization (QLoRA-style), a chat
interpreter with templated prompts and JSON-schema tool calling, and an
ollama-style CLI — extended beyond the reference with Pallas fused kernels,
paged + quantized KV caches, continuous batching, and tensor-sharded
multi-chip execution over a `jax.sharding.Mesh`.

Layer map (bottom → top), mirroring SURVEY.md §1 of the reference:

  reference L0-L2 (Metal RAL, allocators, command scheduling)
      → XLA runtime + `jax.jit` async dispatch; zero-copy weight mmap in
        `metalchat_tpu.io.safetensors` (+ C++ fast path in `native/`).
  reference L3 (tensor)        → `jax.Array` / jnp.
  reference L4 (kernels)       → `metalchat_tpu.ops` (Pallas + XLA reference).
  reference L5 (nn/models)     → `metalchat_tpu.models`, `nn`, `quant`, `sampling`.
  reference L6 (serving)       → `metalchat_tpu.engine`, `chat`.
  reference L7 (model I/O)     → `metalchat_tpu.io`.
  reference LT (text)          → `metalchat_tpu.text`.
  reference L8 (CLI)           → `metalchat_tpu.cli`.
  (new) parallelism            → `metalchat_tpu.parallel`.
"""

__version__ = "0.1.0"

from metalchat_tpu.config import LlamaConfig, Gemma3Config  # noqa: F401
