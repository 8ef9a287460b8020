"""Chat interpreter — the conversational decode loop.

TPU re-design of the reference's `interpreter` (interpreter.h:179-375,
src/interpreter.cc): a session buffers encoded message tokens
(`<|begin_of_text|>` prepended once), `write` renders a mustache template
with declared variables + the tool builtins and encodes header/content/eot,
`read` flushes the buffer through one prefill then single-token decode until
a scanner stops it, and `exec` runs the read→tool-call→ipython-result loop.

Differences from the reference, by design:
  * the KV cache persists across turns (the reference re-encodes the op
    graph per token; here one jitted step per token, cache donated);
  * streaming decode goes through the incremental UTF-8 decoder, so
    multi-byte characters split across tokens render correctly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp

from metalchat_tpu.cache import KVCache, QuantizedKVCache
from metalchat_tpu.chat.scanners import CompositeScanner, LimitScanner, StopTokenScanner, TokenScanner
from metalchat_tpu.chat.template import render_template
from metalchat_tpu.chat.tools import COMMAND_FORMAT, Command, CommandScanner
from metalchat_tpu.config import ModelConfig
from metalchat_tpu.models.transformer import forward
from metalchat_tpu.sampling import SamplerConfig, sample
from metalchat_tpu.text.tokenizer import StreamingDecoder, TokenKind


@dataclass(frozen=True)
class ChatTemplates:
    """Message rendering templates (mustache)."""

    begin_text: str
    header: str      # vars: role
    message: str     # vars: role, content (+ declared vars, metalchat.*)

    @staticmethod
    def llama3() -> "ChatTemplates":
        return ChatTemplates(
            begin_text="<|begin_of_text|>",
            header="<|start_header_id|>{{role}}<|end_header_id|>\n\n",
            message=(
                "<|start_header_id|>{{role}}<|end_header_id|>\n\n"
                "{{content}}<|eot_id|>"
            ),
        )

    @staticmethod
    def gemma3() -> "ChatTemplates":
        return ChatTemplates(
            begin_text="<bos>",
            header="<start_of_turn>{{role}}\n",
            message="<start_of_turn>{{role}}\n{{content}}<end_of_turn>\n",
        )


class Interpreter:
    """Single-session chat loop with persistent KV cache."""

    def __init__(
        self,
        params,
        config: ModelConfig,
        tokenizer,
        *,
        templates: Optional[ChatTemplates] = None,
        sampler: SamplerConfig = SamplerConfig(),
        max_seq_len: Optional[int] = None,
        max_reply_tokens: int = 512,
        commands: Optional[Sequence[Command]] = None,
        scanner: Optional[TokenScanner] = None,
        assistant_role: str = "assistant",
        sink_tokens: Optional[int] = None,
        seed: int = 0,
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.templates = templates or ChatTemplates.llama3()
        self.sampler = sampler
        self.max_seq_len = max_seq_len or config.max_seq_len
        self.max_reply_tokens = max_reply_tokens
        self.assistant_role = assistant_role
        self.sink_tokens = sink_tokens
        self.commands = CommandScanner(list(commands) if commands else [])
        self.variables: Dict[str, Any] = {}
        self._key = jax.random.PRNGKey(seed)
        # HF Jinja2 templates (chat/hf_template.py HFChatTemplates) render
        # whole conversations; the session tracks messages + the canonical
        # rendered text so each write emits only the delta.
        self._hf = hasattr(self.templates, "render_message_delta")
        self._messages: List[Dict[str, str]] = []
        self._hf_emitted = ""

        dtype = params["final_norm"].dtype
        self.cache = KVCache.create(config, 1, self.max_seq_len, dtype=dtype)
        self.pos = 0  # tokens already in the cache
        self._buffer: List[int] = []
        self._write_text(self.templates.begin_text)

        specials = getattr(tokenizer, "specials", None)
        stop_kinds = TokenKind.END_TEXT | TokenKind.END_TURN | TokenKind.END_MESSAGE
        stop_ids = specials.ids_with_kind(stop_kinds) if specials else []
        self.stop_ids = frozenset(stop_ids)
        self.scanner = scanner or CompositeScanner(
            [StopTokenScanner(stop_ids), LimitScanner(max_reply_tokens)]
        )

        cfg = config

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _prefill(params, cache, tokens, start_pos):
            logits, cache = forward(params, cache, tokens, start_pos, cfg)
            return logits[:, -1], cache

        self._prefill = _prefill
        self._decode = _prefill  # same signature with S == 1

    # -- session variables / tools ----------------------------------------

    def declare(self, name: str, value: Any) -> None:
        """Declare a template variable (reference: mustache declared vars)."""
        self.variables[name] = value

    def register_command(self, command: Command) -> None:
        self.commands.register(command)

    # -- writing -----------------------------------------------------------

    def _template_scope(self, **extra: Any) -> Dict[str, Any]:
        scope = dict(self.variables)
        scope.update(extra)
        scope["metalchat"] = {
            "commands": self.commands.describe_all(),
            "command_format": COMMAND_FORMAT,
        }
        return scope

    def _write_text(self, text: str) -> None:
        if text:
            self._buffer.extend(self.tokenizer.encode(text, allow_special=True))

    def write(self, content: str, role: str = "user") -> None:
        """Render + encode one chat message into the pending buffer."""
        self._messages.append({"role": role, "content": content})
        if self._hf:
            full = self.templates._render(self._messages, False)
            if full.startswith(self._hf_emitted):
                text = full[len(self._hf_emitted):]
            else:  # template rewrote earlier text (e.g. trimmed a reply):
                # emit only this message's delta and resync the baseline.
                text = self.templates.render_message_delta(self._messages)
            self._hf_emitted = full
        else:
            text = render_template(
                self.templates.message,
                self._template_scope(role=role, content=content),
            )
        self._write_text(text)

    def write_header(self, role: str) -> None:
        if self._hf:
            text = self.templates.render_generation_header(self._messages)
            self._hf_emitted += text
        else:
            text = render_template(self.templates.header,
                                   self._template_scope(role=role))
        self._write_text(text)

    def _record_reply(self, text: str) -> None:
        """Track a finished assistant reply so the next HF-template delta
        renders against the full conversation (mustache mode: KV is the only
        history, nothing to track)."""
        self._messages.append({"role": self.assistant_role, "content": text})
        if self._hf:
            stop_text = ""
            if self._buffer and self._buffer[-1] in self.stop_ids:
                try:
                    stop_text = self.tokenizer.decode([self._buffer[-1]])
                except Exception:
                    stop_text = ""
            self._hf_emitted += text + stop_text

    # -- reading -----------------------------------------------------------

    def _flush(self) -> int:
        """Prefill all buffered tokens; returns the first sampled token."""
        if not self._buffer:
            raise RuntimeError("nothing to flush — write a message first")
        if self.pos + len(self._buffer) >= self.max_seq_len:
            raise RuntimeError("context window exhausted")
        tokens = jnp.asarray(self._buffer, jnp.int32)[None, :]
        logits, self.cache = self._prefill(self.params, self.cache, tokens, self.pos)
        self.pos += len(self._buffer)
        self._buffer.clear()
        self._key, sub = jax.random.split(self._key)
        return int(sample(logits, sub, self.sampler)[0])

    def read_tokens(self) -> Iterator[int]:
        """Decode assistant tokens until a scanner stops (EOS ids included)."""
        self.write_header(self.assistant_role)
        self.scanner.reset()
        token = self._flush()
        while True:
            exhausted = self.pos + 1 >= self.max_seq_len
            if exhausted and self.sink_tokens is not None:
                # Attention-sinks eviction: keep the session going past the
                # window (reference sink_cache behavior).
                from metalchat_tpu.cache import roll_kv_cache

                shift = max(1, (self.max_seq_len - self.sink_tokens) // 4)
                self.cache = roll_kv_cache(self.cache, self.sink_tokens, shift)
                self.pos -= shift
                exhausted = False
            if not self.scanner.scan(token) or exhausted:
                # Account the stop token into the context then end the turn.
                self._buffer.append(token) if token in self.stop_ids else None
                return
            yield token
            logits, self.cache = self._decode(
                self.params, self.cache, jnp.asarray([[token]], jnp.int32), self.pos
            )
            self.pos += 1
            self._key, sub = jax.random.split(self._key)
            token = int(sample(logits, sub, self.sampler)[0])

    def read_stream(self) -> Iterator[str]:
        decoder = StreamingDecoder(self.tokenizer)
        parts: List[str] = []
        for token in self.read_tokens():
            chunk = decoder.feed(token)
            if chunk:
                parts.append(chunk)
                yield chunk
        tail = decoder.flush()
        if tail:
            parts.append(tail)
            yield tail
        self._record_reply("".join(parts))

    def read(self) -> str:
        return "".join(self.read_stream())

    # -- tool-calling loop --------------------------------------------------

    def exec(self, content: str, role: str = "user", max_rounds: int = 4) -> str:
        """write → read → (tool call → ipython result → read)* → final text
        (reference: interpreter.h:304-324)."""
        self.write(content, role=role)
        for _ in range(max_rounds):
            text = self.read()
            statement = self.commands.parse(text)
            if statement is None:
                return text
            try:
                result = self.commands.execute(statement)
            except Exception as exc:  # tool failures go back to the model
                result = f"error: {exc}"
            self.write(str(result), role="ipython")
        return text


ChatSession = Interpreter
