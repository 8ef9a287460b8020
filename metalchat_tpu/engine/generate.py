"""Generation loops over jitted prefill/decode steps.

The TPU re-design of the reference's decode loop (interpreter.h:358-374 +
transformer.h:353-364): instead of re-encoding ~20 kernels × n_layers into
command buffers per token on the host, the whole step (forward + sampling) is
one compiled XLA program with the KV cache donated in place. Two modes:

  * `generate` — closed-loop `lax.scan` over steps, entirely on device: one
    host sync for the whole generation (the throughput path; the reference
    pays one sync *per token*).
  * `generate_stream` — one jitted step per token with a host sync each, for
    interactive serving/stop-scanner semantics (parity with the reference's
    interpreter loop).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache, QuantizedKVCache
from metalchat_tpu.config import ModelConfig
from metalchat_tpu.models.transformer import Cache, Params, forward
from metalchat_tpu.sampling import SamplerConfig, sample


@jax.tree_util.register_dataclass
@dataclass
class DecodeState:
    """Carry of the decode loop (donated between steps)."""

    cache: Cache
    last_tokens: jax.Array  # [B] int32 — sampled at the previous step
    pos: jax.Array          # scalar int32 — cache fill length
    key: jax.Array          # PRNG key
    done: jax.Array         # [B] bool


def _eos_hit(tokens: jax.Array, eos_ids: Tuple[int, ...]) -> jax.Array:
    if not eos_ids:
        return jnp.zeros(tokens.shape, bool)
    eos = jnp.asarray(eos_ids, jnp.int32)
    return jnp.any(tokens[:, None] == eos[None, :], axis=-1)


def _default_forward(config: ModelConfig, params=None):
    # Concrete sharded params + Pallas fast decode don't compose under
    # GSPMD (custom calls aren't partitionable) — pin the XLA path; the
    # shard_map tp path (parallel.tp_decode) is the sharded fast path.
    if params is not None:
        from metalchat_tpu.models.decode import params_partitioned
        from metalchat_tpu.ops import use_pallas

        if use_pallas() and params_partitioned(params):
            return lambda p, c, t, s: forward(p, c, t, s, config,
                                              fast_decode=False)
    return lambda p, c, t, s: forward(p, c, t, s, config)


def make_prefill(config: ModelConfig, sampler: SamplerConfig, eos_ids: Tuple[int, ...] = (),
                 forward_fn=None):
    """Returns jitted prefill(params, cache, tokens, start_pos, key) → DecodeState.

    `forward_fn(params, cache, tokens, start_pos) -> (logits, cache)` swaps
    the model step — e.g. `parallel.make_pipeline_forward` for pp serving."""
    fwd = forward_fn or _default_forward(config)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill(params: Params, cache: Cache, tokens: jax.Array, start_pos, key) -> DecodeState:
        logits, cache = fwd(params, cache, tokens, start_pos)
        key, sub = jax.random.split(key)
        next_tokens = sample(logits[:, -1], sub, sampler)
        return DecodeState(
            cache=cache,
            last_tokens=next_tokens,
            pos=jnp.asarray(start_pos, jnp.int32) + tokens.shape[1],
            key=key,
            done=_eos_hit(next_tokens, eos_ids),
        )

    return prefill


def make_decode_step(config: ModelConfig, sampler: SamplerConfig, eos_ids: Tuple[int, ...] = (),
                     forward_fn=None):
    """Returns jitted step(params, state) → (state, emitted_tokens [B])."""
    fwd = forward_fn or _default_forward(config)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(params: Params, state: DecodeState) -> Tuple[DecodeState, jax.Array]:
        emitted = state.last_tokens
        logits, cache = fwd(
            params, state.cache, state.last_tokens[:, None], state.pos
        )
        key, sub = jax.random.split(state.key)
        next_tokens = sample(logits[:, -1], sub, sampler)
        done = state.done | _eos_hit(next_tokens, eos_ids)
        # Hold the last token once a row is done (emitted ids stay stable).
        next_tokens = jnp.where(state.done, state.last_tokens, next_tokens)
        return (
            DecodeState(cache, next_tokens, state.pos + 1, key, done),
            emitted,
        )

    return step


def generate(
    params: Params,
    config: ModelConfig,
    prompt: jax.Array,
    *,
    max_new_tokens: int,
    sampler: SamplerConfig = SamplerConfig.greedy(),
    eos_ids: Tuple[int, ...] = (),
    seed: int = 0,
    cache: Optional[Cache] = None,
    quantized_kv: bool = False,
    max_seq_len: Optional[int] = None,
    forward_fn=None,
    context_parallel_mesh=None,
    context_parallel_axis: str = "sp",
) -> jax.Array:
    """Closed-loop generation: prompt [B, S] → generated ids [B, max_new_tokens].

    The decode loop is a `lax.scan` inside one jit — a single dispatch and a
    single host sync for the entire generation.

    forward_fn swaps the model step (e.g. `parallel.make_pipeline_forward`
    for pipeline-parallel serving). context_parallel_mesh routes the prompt
    prefill through sequence-sharded ring attention
    (`parallel.context_parallel_prefill`) — long-prompt TTFT spreads over
    the mesh axis; decode then proceeds normally.
    """
    b, s = prompt.shape
    if cache is None:
        limit = max_seq_len or min(config.max_seq_len, s + max_new_tokens)
        cls = QuantizedKVCache if quantized_kv else KVCache
        cache = cls.create(config, b, limit)
    fwd = forward_fn or _default_forward(config, params)

    def first_state(logits, cache, key):
        key, sub = jax.random.split(key)
        first = sample(logits, sub, sampler)
        return DecodeState(
            cache=cache,
            last_tokens=first,
            pos=jnp.asarray(s, jnp.int32),
            key=key,
            done=_eos_hit(first, eos_ids),
        )

    def decode_body(state, _):
        emitted = state.last_tokens
        logits, cache = fwd(
            params, state.cache, state.last_tokens[:, None], state.pos
        )
        key, sub = jax.random.split(state.key)
        nxt = sample(logits[:, -1], sub, sampler)
        done = state.done | _eos_hit(nxt, eos_ids)
        nxt = jnp.where(state.done, state.last_tokens, nxt)
        return DecodeState(cache, nxt, state.pos + 1, key, done), emitted

    if context_parallel_mesh is not None:
        from metalchat_tpu.parallel.context import context_parallel_prefill

        @functools.partial(jax.jit, donate_argnums=(1,), static_argnames="steps")
        def run_cp(params, cache, prompt, key, steps: int):
            logits, cache = context_parallel_prefill(
                params, cache, prompt, config,
                context_parallel_mesh, context_parallel_axis)
            state = first_state(logits, cache, key)
            state, tokens = jax.lax.scan(decode_body, state, length=steps)
            return tokens.T

        return run_cp(params, cache, prompt, jax.random.PRNGKey(seed),
                      steps=max_new_tokens)

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnames="steps")
    def run(params, cache, prompt, key, steps: int):
        logits, cache = fwd(params, cache, prompt, 0)
        state = first_state(logits[:, -1], cache, key)
        state, tokens = jax.lax.scan(decode_body, state, length=steps)
        return tokens.T  # [steps, B] → [B, steps]

    return run(params, cache, prompt, jax.random.PRNGKey(seed), steps=max_new_tokens)


def generate_stream(
    params: Params,
    config: ModelConfig,
    prompt: Sequence[int],
    *,
    max_new_tokens: int,
    sampler: SamplerConfig = SamplerConfig(),
    eos_ids: Tuple[int, ...] = (),
    seed: int = 0,
    cache: Optional[Cache] = None,
    start_pos: int = 0,
    max_seq_len: Optional[int] = None,
    sink_tokens: Optional[int] = None,
    forward_fn=None,
) -> Iterator[int]:
    """Stream generated token ids one at a time (batch of one).

    Stops on EOS or token budget; the caller (chat interpreter) applies its
    own scanners on top. Reuses a caller-provided cache for multi-turn
    sessions (the interpreter keeps the conversation's KV warm).

    `sink_tokens` enables attention-sinks eviction (the reference's
    sink_cache, nn/cache.h): when the cache fills, the first `sink_tokens`
    positions are pinned and a quarter of the window is evicted in bulk, so
    generation continues past the cache length at degraded fidelity.
    """
    import dataclasses as _dc

    tokens = jnp.asarray(prompt, jnp.int32)[None, :]
    if cache is None:
        limit = max_seq_len or min(config.max_seq_len, len(prompt) + max_new_tokens + start_pos)
        cache = KVCache.create(config, 1, limit)
    cache_len = cache.max_seq_len
    prefill = make_prefill(config, sampler, eos_ids, forward_fn=forward_fn)
    step = make_decode_step(config, sampler, eos_ids, forward_fn=forward_fn)
    state = prefill(params, cache, tokens, start_pos, jax.random.PRNGKey(seed))
    for _ in range(max_new_tokens):
        token = int(state.last_tokens[0])
        if bool(state.done[0]) and token in eos_ids:
            yield token
            return
        yield token
        if int(state.pos) + 1 >= cache_len:
            if sink_tokens is None:
                return  # context window exhausted
            from metalchat_tpu.cache import roll_kv_cache

            shift = max(1, (cache_len - sink_tokens) // 4)
            state = _dc.replace(
                state,
                cache=roll_kv_cache(state.cache, sink_tokens, shift),
                pos=state.pos - shift,
            )
        state, _ = step(params, state)
