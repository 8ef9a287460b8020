"""HuggingFace `chat_template` (Jinja2) rendering.

The framework's native chat formatting is the mustache interpreter
(chat/template.py, mirroring the reference); this module adds drop-in
compatibility with the HF ecosystem, where each checkpoint ships a Jinja2
`chat_template` in tokenizer_config.json. Rendering the full conversation
through the checkpoint's own template is the safest way to serve arbitrary
models whose prompt format this framework doesn't special-case.

Implements the HF template environment surface templates actually use:
`messages` / `tools` / `add_generation_prompt` / `bos_token` / `eos_token`
variables, plus the `tojson` filter, `raise_exception`, and `strftime_now`.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Iterable, Mapping, Optional, Sequence


class TemplateError(ValueError):
    pass


def load_chat_template(model_dir: str | Path) -> Optional[str]:
    """Read `chat_template` from tokenizer_config.json (None if absent).

    Handles both the plain-string form and the named-list form
    ([{"name": "default", "template": ...}, ...]).
    """
    path = Path(model_dir) / "tokenizer_config.json"
    if not path.exists():
        return None
    cfg = json.loads(path.read_text())
    tpl = cfg.get("chat_template")
    if tpl is None:
        return None
    if isinstance(tpl, list):
        by_name = {t.get("name"): t.get("template") for t in tpl}
        return by_name.get("default") or next(iter(by_name.values()), None)
    return tpl


def render_chat_template(
    template: str,
    messages: Sequence[Mapping[str, Any]],
    *,
    add_generation_prompt: bool = True,
    tools: Optional[Iterable[Mapping[str, Any]]] = None,
    bos_token: str = "",
    eos_token: str = "",
    **extra: Any,
) -> str:
    """Render a conversation through an HF Jinja2 chat template."""
    import jinja2

    def raise_exception(message: str):
        raise TemplateError(message)

    def strftime_now(fmt: str) -> str:
        import datetime

        return datetime.datetime.now().strftime(fmt)

    env = jinja2.Environment(
        loader=jinja2.BaseLoader(),
        trim_blocks=True,
        lstrip_blocks=True,
        undefined=jinja2.StrictUndefined,
        extensions=["jinja2.ext.loopcontrols"],
    )
    env.filters["tojson"] = lambda v, **kw: json.dumps(v, **kw)
    env.globals["raise_exception"] = raise_exception
    env.globals["strftime_now"] = strftime_now

    try:
        compiled = env.from_string(template)
        return compiled.render(
            messages=list(messages),
            tools=list(tools) if tools else None,
            add_generation_prompt=add_generation_prompt,
            bos_token=bos_token,
            eos_token=eos_token,
            **extra,
        )
    except jinja2.exceptions.UndefinedError:
        # Templates probe optional vars; retry leniently.
        env.undefined = jinja2.Undefined
        compiled = env.from_string(template)
        return compiled.render(
            messages=list(messages),
            tools=list(tools) if tools else None,
            add_generation_prompt=add_generation_prompt,
            bos_token=bos_token,
            eos_token=eos_token,
            **extra,
        )
