"""HF chat-template chat sessions: incremental deltas must reproduce the
full-conversation rendering exactly (reference renders templates from model
artifacts — src/interpreter.cc:116-136; here the artifact is
tokenizer_config.json's Jinja2 chat_template)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from metalchat_tpu.chat.hf_template import (
    HFChatTemplates,
    load_hf_chat_templates,
    render_chat_template,
)

LLAMA3ISH = (
    "{{ bos_token }}{% for m in messages %}"
    "{{ '<|start_header_id|>' + m['role'] + '<|end_header_id|>\n\n' + m['content'] + '<|eot_id|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}"
)

GEMMAISH = (
    "{{ '<bos>' }}{% for m in messages %}"
    "{{ '<start_of_turn>' + m['role'] + '\n' + m['content'] + '<end_of_turn>\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<start_of_turn>model\n' }}{% endif %}"
)


def test_deltas_reconstruct_full_render():
    tpl = HFChatTemplates(LLAMA3ISH, bos_token="<|begin_of_text|>")
    msgs = []
    emitted = tpl.begin_text
    for m in [{"role": "system", "content": "Be brief."},
              {"role": "user", "content": "Hi!"}]:
        msgs.append(m)
        emitted += tpl.render_message_delta(msgs)
    emitted += tpl.render_generation_header(msgs)
    want = render_chat_template(LLAMA3ISH, msgs, add_generation_prompt=True,
                                bos_token="<|begin_of_text|>")
    assert emitted == want


def test_deltas_heal_post_stop_whitespace():
    """Gemma-style templates put '\\n' AFTER <end_of_turn>; generation stops
    at the token, so the next delta must supply the missing newline."""
    tpl = HFChatTemplates(GEMMAISH)
    msgs = [{"role": "user", "content": "hey"}]
    emitted = tpl.render_message_delta(msgs)
    emitted += tpl.render_generation_header(msgs)
    # Simulate generation: reply text + the stop token's own text.
    msgs.append({"role": "model", "content": "yo"})
    emitted += "yo" + "<end_of_turn>"
    msgs.append({"role": "user", "content": "more"})
    full = render_chat_template(GEMMAISH, msgs, add_generation_prompt=False)
    assert full.startswith(emitted)
    delta = full[len(emitted):]
    assert delta.startswith("\n<start_of_turn>user")  # healed newline


@pytest.mark.skipif(
    pytest.importorskip("transformers", reason="oracle") is None, reason="")
def test_matches_transformers_multiturn():
    from transformers.utils.chat_template_utils import render_jinja_template

    msgs = [{"role": "system", "content": "sys"},
            {"role": "user", "content": "a"},
            {"role": "assistant", "content": "b"},
            {"role": "user", "content": "c"}]
    tpl = HFChatTemplates(LLAMA3ISH, bos_token="<|begin_of_text|>")
    emitted = ""
    for i in range(1, len(msgs) + 1):
        emitted += tpl.render_message_delta(msgs[:i])
    want, _ = render_jinja_template(
        conversations=[msgs], chat_template=LLAMA3ISH,
        add_generation_prompt=False, tools=None, documents=None,
        bos_token="<|begin_of_text|>",
    )
    assert emitted == want[0]


def test_interpreter_session_with_hf_template():
    """End-to-end session on a tiny model: the emitted-text ledger matches
    the canonical full-conversation rendering at every turn boundary."""
    from metalchat_tpu.chat.interpreter import Interpreter
    from metalchat_tpu.models import init_random_params
    from test_chat import _byte_tokenizer
    from test_model import TINY_LLAMA

    cfg = TINY_LLAMA.replace(vocab_size=262, max_seq_len=256)
    params = init_random_params(cfg, seed=77, dtype=jnp.float32)
    tpl = HFChatTemplates(LLAMA3ISH, bos_token="<|begin_of_text|>")
    session = Interpreter(params, cfg, _byte_tokenizer(), templates=tpl,
                          max_reply_tokens=8)
    session.write("hello", role="user")
    reply = session.read()
    assert isinstance(reply, str)
    assert session._messages[-1]["role"] == "assistant"
    # Next turn renders a consistent delta (no exception, no resync needed
    # for raw byte content without leading/trailing whitespace).
    session.write("again", role="user")
    full = tpl._render(session._messages, False)
    assert session._hf_emitted == full


def test_load_hf_chat_templates(tmp_path):
    assert load_hf_chat_templates(tmp_path) is None
    (tmp_path / "tokenizer_config.json").write_text(json.dumps({
        "chat_template": LLAMA3ISH,
        "bos_token": {"content": "<|begin_of_text|>"},
        "eos_token": "<|eot_id|>",
    }))
    tpl = load_hf_chat_templates(tmp_path)
    assert tpl is not None
    assert tpl.bos_token == "<|begin_of_text|>"
    assert tpl.eos_token == "<|eot_id|>"
