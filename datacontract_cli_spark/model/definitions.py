"""Remote definition inlining: resolve authoritativeDefinitions references
on properties and merge the fetched definition into the property.

Reference behavior: datacontract/lint/resolve.py:144-305 —

- resolvable types, precedence-ordered: ``semantics`` > ``semantic`` >
  ``definition`` (the first resolvable reference on a property wins);
- inline values always win: only fields the definition sets AND the
  contract author left unset are merged; ``id``/``name``/
  ``authoritativeDefinitions``/``properties``/``items`` never merge;
- recursion into nested properties and array items;
- resolution failure rejects the contract (raises);
- per-process success-only cache — transient failures retry next run.

Fetching here supports local paths, file:// URLs, and http(s) URLs (the
reference routes off-host semantics IRIs through its registry API with an
API key; that hosted-service lane is out of scope for this engine — such
URLs are fetched directly)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import yaml

_RESOLVABLE_TYPES = ("semantics", "semantic", "definition")
_NON_MERGEABLE = frozenset({"id", "name", "authoritativeDefinitions",
                            "properties", "items"})

# success-only cache: url -> parsed definition dict
_definition_cache: Dict[str, Dict[str, Any]] = {}


def clear_definition_cache() -> None:
    _definition_cache.clear()


class DefinitionResolutionError(ValueError):
    """A broken authoritativeDefinitions reference — rejects the contract."""


def _fetch(url: str) -> str:
    if url.startswith(("http://", "https://")):
        from urllib.request import Request, urlopen

        req = Request(url, headers={"Accept": "application/json"})
        with urlopen(req, timeout=10) as resp:  # noqa: S310 — user-specified url
            if getattr(resp, "status", 200) != 200:
                raise DefinitionResolutionError(
                    f"cannot resolve definition '{url}': HTTP {resp.status}")
            return resp.read().decode("utf-8")
    path = url[7:] if url.startswith("file://") else url
    with open(path, "r", encoding="utf-8") as f:
        return f.read()


def _resolve_definition(url: str) -> Dict[str, Any]:
    if url in _definition_cache:
        return _definition_cache[url]
    try:
        text = _fetch(url)
    except DefinitionResolutionError:
        raise
    except Exception as e:
        raise DefinitionResolutionError(
            f"cannot resolve definition '{url}': {e}") from e
    try:
        parsed = yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise DefinitionResolutionError(
            f"definition at '{url}' is not parseable: {e}") from e
    if not isinstance(parsed, dict):
        raise DefinitionResolutionError(
            f"definition at '{url}' is not a valid ODCS property (got "
            f"{type(parsed).__name__})")
    _definition_cache[url] = parsed
    return parsed


def _resolvable_reference(prop: Dict[str, Any]) -> Optional[Tuple[str, str]]:
    refs = prop.get("authoritativeDefinitions")
    if not isinstance(refs, list):
        return None
    for wanted in _RESOLVABLE_TYPES:
        for ad in refs:
            if isinstance(ad, dict) and ad.get("type") == wanted and ad.get("url"):
                return wanted, str(ad["url"])
    return None


def _inline_property(prop: Dict[str, Any]) -> None:
    items = prop.get("items")
    if isinstance(items, dict):
        _inline_property(items)
    for nested in prop.get("properties") or []:
        if isinstance(nested, dict):
            _inline_property(nested)
    ref = _resolvable_reference(prop)
    if ref is None:
        return
    _, url = ref
    definition = _resolve_definition(url)
    # inline wins: merge only author-unset, mergeable fields. "Set" for the
    # author is key presence in the raw document (description: "" stays).
    for key, value in definition.items():
        if key in _NON_MERGEABLE or key in prop:
            continue
        prop[key] = value


def inline_definitions(doc: Dict[str, Any]) -> None:
    """Resolve and inline authoritativeDefinitions on every property of an
    ODCS document dict, in place. Raises DefinitionResolutionError on any
    broken reference."""
    for schema_obj in doc.get("schema") or []:
        if not isinstance(schema_obj, dict):
            continue
        for prop in schema_obj.get("properties") or []:
            if isinstance(prop, dict):
                _inline_property(prop)
