"""LLM client — the reference's Anthropic call path as a transport-injectable
component (SURVEY §3.1; reference ``sap_sql_engine.py:365-455`` classify call,
``:837-898`` generation call with retry + prompt caching).

Design: the engine never talks HTTP directly in the NL pipeline — ``nl``
accepts any ``(system_prompt, user_text) -> str`` callable. ``LLMClient`` is
the production implementation of that callable:

- **transport injection**: the constructor takes ``transport(payload) ->
  response-dict`` (Messages-API shapes). The default transport POSTs to the
  public Anthropic Messages API with stdlib ``urllib`` (the ``anthropic``
  SDK is not a hard dependency); tests inject fakes.
- **retry/backoff**: 3 attempts, 1 s / 2 s / 4 s exponential waits, retrying
  only transient statuses 500/502/503/529 — byte-for-byte the reference's
  policy (``sap_sql_engine.py:887-898``). Non-transient statuses raise
  immediately.
- **prompt caching**: the system prompt is sent as a block list with
  ``cache_control: {"type": "ephemeral"}`` so repeated calls with the same
  schema context hit the provider-side prompt cache (``:865-871``).
- **usage accounting** (§2.11 C6): every call records input/output/
  cache-creation/cache-read token counts; ``session_usage`` accumulates them
  and ``cost_usd`` prices them with the UI's model-aware table
  (``sap_sql_ui.html:1904-1919``).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable

DEFAULT_MODEL = "claude-sonnet-4-5-20250929"

# models the reference's /api/save-model accepts (sap_sql_engine.py:1573-1578)
ALLOWED_MODELS = frozenset(
    {
        "claude-sonnet-4-5-20250929",
        "claude-sonnet-4-20250514",
        "claude-haiku-4-20250414",
    }
)

# $/Mtok — mirrors the UI's MODEL_PRICING (sap_sql_ui.html:1904-1909)
MODEL_PRICING = {
    "claude-sonnet-4-5-20250929": {"input": 3.0, "output": 15.0, "cache_write": 3.75, "cache_read": 0.30},
    "claude-sonnet-4-20250514": {"input": 3.0, "output": 15.0, "cache_write": 3.75, "cache_read": 0.30},
    "claude-haiku-4-20250414": {"input": 0.80, "output": 4.0, "cache_write": 1.00, "cache_read": 0.08},
}
_DEFAULT_PRICING = MODEL_PRICING[DEFAULT_MODEL]

RETRYABLE_STATUSES = frozenset({500, 502, 503, 529})
MAX_RETRIES = 3
MAX_TOKENS = 4096

API_URL = "https://api.anthropic.com/v1/messages"
API_VERSION = "2023-06-01"


class LLMError(Exception):
    """API failure after retries (or a non-retryable status)."""

    def __init__(self, message: str, status_code: int | None = None):
        super().__init__(message)
        self.status_code = status_code


def valid_key_format(key: str) -> bool:
    """The reference's /api/save-key format gate (sap_sql_engine.py:1531)."""
    return key.startswith("sk-ant-")


def key_preview(key: str) -> str:
    return f"...{key[-6:]}"


def _usage_of(response: dict) -> dict:
    u = response.get("usage") or {}
    return {
        "input_tokens": u.get("input_tokens", 0) or 0,
        "output_tokens": u.get("output_tokens", 0) or 0,
        "cache_creation_input_tokens": u.get("cache_creation_input_tokens", 0) or 0,
        "cache_read_input_tokens": u.get("cache_read_input_tokens", 0) or 0,
    }


def cost_usd(usage: dict, model: str = DEFAULT_MODEL) -> float:
    """Model-aware pricing incl. cache write/read rates (the four counts are
    non-overlapping per the Messages API)."""
    p = MODEL_PRICING.get(model, _DEFAULT_PRICING)
    return (
        usage.get("input_tokens", 0) / 1e6 * p["input"]
        + usage.get("cache_creation_input_tokens", 0) / 1e6 * p["cache_write"]
        + usage.get("cache_read_input_tokens", 0) / 1e6 * p["cache_read"]
        + usage.get("output_tokens", 0) / 1e6 * p["output"]
    )


def http_transport(api_key: str) -> Callable[[dict], dict]:
    """Default production transport: stdlib-urllib POST to the Messages API.
    Raises ``LLMError`` carrying the HTTP status so the retry loop can
    classify it."""

    def send(payload: dict) -> dict:
        req = urllib.request.Request(
            API_URL,
            data=json.dumps(payload).encode(),
            headers={
                "Content-Type": "application/json",
                "x-api-key": api_key,
                "anthropic-version": API_VERSION,
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            raise LLMError(e.read().decode(errors="replace")[:500], e.code) from e
        except urllib.error.URLError as e:
            raise LLMError(str(e.reason), None) from e

    return send


class LLMClient:
    """Callable LLM with the reference's retry + caching behavior.

    ``client(system_prompt, user_text) -> str`` makes it directly pluggable
    wherever ``nl`` takes an ``llm`` argument; ``complete`` exposes the full
    messages interface (history, custom max_tokens) and the usage dict.
    """

    def __init__(
        self,
        api_key: str = "",
        model: str = DEFAULT_MODEL,
        transport: Callable[[dict], dict] | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.model = model
        self.transport = transport or http_transport(api_key)
        self._sleep = sleep
        self.last_usage: dict = {}
        self.session_usage = {
            "queries": 0,
            "input_tokens": 0,
            "output_tokens": 0,
            "cache_creation_input_tokens": 0,
            "cache_read_input_tokens": 0,
        }

    # -- core ---------------------------------------------------------------

    def complete(
        self,
        system: str,
        messages: list[dict],
        max_tokens: int = MAX_TOKENS,
    ) -> dict:
        """One Messages call -> ``{"text", "usage"}``, retrying transient
        failures with 1 s/2 s/4 s waits (reference ``:887-898``)."""
        payload = {
            "model": self.model,
            "max_tokens": max_tokens,
            "system": [
                {
                    "type": "text",
                    "text": system,
                    "cache_control": {"type": "ephemeral"},
                }
            ],
            "messages": messages,
        }
        last_err: LLMError | None = None
        for attempt in range(MAX_RETRIES):
            try:
                response = self.transport(payload)
            except LLMError as e:
                if e.status_code in RETRYABLE_STATUSES and attempt < MAX_RETRIES - 1:
                    last_err = e
                    self._sleep(2**attempt)  # 1 s, 2 s, 4 s
                    continue
                raise
            text = "".join(
                b.get("text", "") for b in response.get("content", []) if b.get("type") == "text"
            )
            usage = _usage_of(response)
            self.last_usage = usage
            self.session_usage["queries"] += 1
            for k in (
                "input_tokens",
                "output_tokens",
                "cache_creation_input_tokens",
                "cache_read_input_tokens",
            ):
                self.session_usage[k] += usage[k]
            return {"text": text, "usage": usage}
        raise last_err  # pragma: no cover — loop always returns or raises

    def __call__(self, system_prompt: str, user_text: str) -> str:
        return self.complete(system_prompt, [{"role": "user", "content": user_text}])["text"]

    # -- key validation probe ----------------------------------------------

    def probe(self) -> None:
        """Tiny live call used by /api/save-key to validate a key (reference
        ``:1537-1548``: 10-token "Say OK"). Raises LLMError on failure."""
        self.complete("Reply with OK.", [{"role": "user", "content": "Say OK"}], max_tokens=10)

    def session_cost_usd(self) -> float:
        return cost_usd(self.session_usage, self.model)
