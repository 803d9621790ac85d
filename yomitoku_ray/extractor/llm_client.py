"""LLM-based extraction client + resolver (optional stage, STUBBED).

Mirrors the reference's vLLM/OpenAI-compatible client
(``/root/reference/src/yomitoku/extractor/llm_client.py:18-56``), prompt
contract (``extractor/prompt.py:11-31``) and cell-id resolver
(``extractor/resolver.py:30-118``). No network exists in this environment,
so the transport is a seam: ``FakeLlmClient`` returns a deterministic
answer derived from the semantic document (so the full resolve/normalize
pipeline is exercisable end-to-end), and ``OpenAiCompatClient`` raises
unless the optional client library is importable.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List

from .rule_pipeline import ResolvedElement, ResolvedField


def strip_json_fences(text: str) -> str:
    """```json fence stripping. Parity: llm_client.py:37-45."""
    m = re.search(r"```(?:json)?\s*(.*?)```", text, re.DOTALL)
    if m:
        return m.group(1).strip()
    return text.strip()


def parse_llm_json(text: str) -> Dict[str, Any]:
    """JSON-mode parse with fence fallback. Parity: llm_client.py:46-56."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        try:
            return json.loads(strip_json_fences(text))
        except json.JSONDecodeError:
            return {}


def build_messages(semantic_info, schema, table_id=None) -> List[dict]:
    """System/user prompt pair. Shape parity: extractor/prompt.py:11-31."""
    tables = semantic_info.tables
    if table_id is not None:
        t = semantic_info.find_table_by_id(table_id)
        tables = [t] if t else []
    doc_repr = {
        "tables": {
            t.id: {"kv_items": t.kv_items_to_dict(), "grids": t.grids_to_dict()}
            for t in tables
        },
        "paragraphs": [p.contents or "" for p in semantic_info.paragraphs],
    }
    fields_repr = [
        {"name": f.name, "description": f.description, "structure": f.structure}
        for f in schema.fields
    ]
    system = (
        "You extract fields from a parsed document. Answer with JSON "
        '{"results": [{"name": ..., "value": ..., "cell_ids": [...]}]} only.'
    )
    user = json.dumps(
        {"document": doc_repr, "fields": fields_repr}, ensure_ascii=False
    )
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": user},
    ]


class OpenAiCompatClient:
    """Real transport against any OpenAI-compatible /chat/completions server.

    Config-gated: the base url comes from the constructor or the
    ``YOMITOKU_RAY_LLM_BASE_URL`` env var; with neither set, construction
    raises and callers fall back to :class:`FakeLlmClient` (the default in
    :func:`run_llm_extraction`). Uses stdlib urllib — no client-library
    dependency. Request contract mirrors the reference
    (``llm_client.py:18-56``): JSON mode first, plain-text retry when the
    server rejects ``response_format``, fence-tolerant JSON parse.
    """

    def __init__(self, api_base=None, api_key="", model="", timeout=60.0):
        import os

        api_base = api_base or os.environ.get("YOMITOKU_RAY_LLM_BASE_URL")
        if not api_base:
            raise NotImplementedError(
                "LLM extraction needs an OpenAI-compatible endpoint: pass "
                "api_base or set YOMITOKU_RAY_LLM_BASE_URL; use "
                "FakeLlmClient for the deterministic stand-in"
            )
        self.api_base = api_base.rstrip("/")
        self.api_key = api_key or os.environ.get("YOMITOKU_RAY_LLM_API_KEY", "EMPTY")
        self.model = model or os.environ.get("YOMITOKU_RAY_LLM_MODEL", "")
        self.timeout = timeout

    def _post(self, payload: dict) -> dict:
        import urllib.request

        req = urllib.request.Request(
            f"{self.api_base}/chat/completions",
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def chat(self, messages, temperature=0.0, max_tokens=4096) -> dict:
        payload = {
            "model": self.model,
            "messages": messages,
            "temperature": temperature,
            "max_tokens": max_tokens,
        }
        try:
            body = self._post({**payload, "response_format": {"type": "json_object"}})
        except Exception:
            # Reference parity: servers without JSON mode get a plain retry
            # (llm_client.py:44-50).
            body = self._post(payload)
        content = body["choices"][0]["message"]["content"]
        return parse_llm_json(content)


class FakeLlmClient:
    """Deterministic stand-in: answers every field by KV-key lookup."""

    def __init__(self, semantic_info, schema):
        self.semantic_info = semantic_info
        self.schema = schema

    def chat(self, messages, temperature=0.0, max_tokens=4096) -> dict:
        results = []
        for f in self.schema.fields:
            value = ""
            cell_ids: List[str] = []
            if f.description:
                kvs = self.semantic_info.search_kv_items_by_key(f.description)
                if kvs and kvs[0]["value"] is not None and not isinstance(
                    kvs[0]["value"], list
                ):
                    value = kvs[0]["value"].contents or ""
                    cell_ids = [kvs[0]["value"].id]
            results.append({"name": f.name, "value": value, "cell_ids": cell_ids})
        return {"results": results}


def build_lookup(semantic_info) -> Dict[str, Any]:
    """cell_id/paragraph-id -> object map. Parity: resolver.py:30-50."""
    lookup: Dict[str, Any] = {}
    for table in semantic_info.tables:
        for cell_id, cell in table.cells.items():
            lookup[cell_id] = cell
    for i, paragraph in enumerate(semantic_info.paragraphs):
        pid = paragraph.id if paragraph.id else f"p{i}"
        lookup[pid] = paragraph
    return lookup


def resolve_fields(results: List[dict], lookup: Dict[str, Any]) -> List[ResolvedField]:
    """LLM answers -> ResolvedFields with provenance. Parity: resolver.py:53-118."""
    resolved = []
    for item in results:
        name = item.get("name", "")
        value = item.get("value", "")
        cell_ids = item.get("cell_ids") or []
        elements = []
        for cid in cell_ids:
            obj = lookup.get(str(cid))
            if obj is None:
                continue
            elements.append(
                ResolvedElement(
                    id=str(cid),
                    box=list(obj.box),
                    contents=obj.contents or "",
                )
            )
        confidence = "high" if elements else ("medium" if value else "low")
        resolved.append(
            ResolvedField(
                name=name,
                value=value,
                raw_text=" ".join(e.contents for e in elements),
                elements=elements,
                confidence=confidence,
                source="llm",
            )
        )
    return resolved


def run_llm_extraction(semantic_info, schema, client=None, simple=True):
    """LLM extraction path. Parity: extractor/pipeline.py:140-198
    (prompt build -> chat -> resolve -> normalize -> output)."""
    from .rule_pipeline import (
        _build_output,
        _build_simple_output,
        _normalize_resolved_fields,
    )

    if client is None:
        client = FakeLlmClient(semantic_info, schema)
    messages = build_messages(semantic_info, schema)
    response = client.chat(messages)
    results = response.get("results", [])
    lookup = build_lookup(semantic_info)
    resolved = resolve_fields(results, lookup)
    resolved = _normalize_resolved_fields(resolved, schema)
    return _build_simple_output(resolved) if simple else _build_output(resolved)
