"""JSON-schema tool calling.

Analog of the reference's command layer (command.h + src/command.cc): tools
are declared with a JSON-schema parameter spec (the reference validates with
jsoncons jsonschema; here `jsonschema`), the model's output is scanned for a
``<|python_tag|>{json}`` call (src/command.cc:129-159), validated, and
dispatched to the registered handler.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Mapping, Optional

import jsonschema

PYTHON_TAG = "<|python_tag|>"

# Prompt-side description of the call format (the reference exposes it as the
# {{metalchat.command_format}} builtin).
COMMAND_FORMAT = (
    'Respond with a JSON object {"name": <tool>, "parameters": {...}} '
    f"prefixed by {PYTHON_TAG} to call a tool."
)


@dataclass
class Command:
    """A callable tool with a JSON-schema parameter declaration."""

    name: str
    description: str
    parameters: Mapping[str, Any]           # JSON schema for the arguments
    handler: Optional[Callable[..., Any]] = None

    def describe(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "description": self.description,
            "parameters": dict(self.parameters),
        }

    def validate(self, arguments: Mapping[str, Any]) -> None:
        jsonschema.validate(instance=dict(arguments), schema=dict(self.parameters))

    def __call__(self, **arguments: Any) -> Any:
        if self.handler is None:
            raise RuntimeError(f"command {self.name!r} has no handler")
        self.validate(arguments)
        return self.handler(**arguments)


@dataclass
class CommandStatement:
    """A parsed tool invocation (reference: command_statement param access)."""

    name: str
    parameters: Dict[str, Any] = field(default_factory=dict)

    def __getitem__(self, key: str) -> Any:
        return self.parameters[key]


class CommandScanner:
    """Detect and parse ``<|python_tag|>{json}`` tool calls in model output."""

    _JSON_RE = re.compile(r"\{.*\}", re.S)

    def __init__(self, commands: Optional[List[Command]] = None):
        self.commands: Dict[str, Command] = {}
        for c in commands or []:
            self.register(c)

    def register(self, command: Command) -> None:
        self.commands[command.name] = command

    def describe_all(self) -> str:
        """The {{metalchat.commands}} builtin payload."""
        return json.dumps([c.describe() for c in self.commands.values()], indent=2)

    def parse(self, text: str) -> Optional[CommandStatement]:
        """Extract a tool call from generated text, or None."""
        if PYTHON_TAG in text:
            payload = text.split(PYTHON_TAG, 1)[1]
        else:
            payload = text
        m = self._JSON_RE.search(payload)
        if not m:
            return None
        try:
            obj = json.loads(m.group(0))
        except json.JSONDecodeError:
            return None
        if not isinstance(obj, dict) or "name" not in obj:
            return None
        params = obj.get("parameters", obj.get("arguments", {}))
        if not isinstance(params, dict):
            return None
        return CommandStatement(name=str(obj["name"]), parameters=params)

    def execute(self, statement: CommandStatement) -> Any:
        command = self.commands.get(statement.name)
        if command is None:
            raise KeyError(f"unknown command {statement.name!r}")
        return command(**statement.parameters)
