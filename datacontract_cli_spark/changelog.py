"""Contract changelog: diff two contract versions into Added/Removed/Updated
entries with a rolled-up summary.

Reference behavior: datacontract/changelog/changelog.py +
changelog/normalize.py — named lists are keyed by their natural key before
diffing (schema by name, properties by name recursively, slaProperties by
property, servers by server, customProperties by property, team.members by
username, support by channel, roles by role) so items match semantically
rather than by position; the detail lane lists every leaf path (whole added
objects expand recursively, path-only entries for dict nodes); the summary
lane rolls scalar leaves up to their parent, keeps whole-object adds at
their own path, and collapses mixed add+remove on one parent to Updated.
The reference diffs via the DeepDiff library; this module implements the
recursive diff directly (same event classes: dictionary/iterable item
added/removed, values changed)."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml


class ChangelogType(str, enum.Enum):
    added = "Added"
    removed = "Removed"
    updated = "Updated"


@dataclass
class ChangelogEntry:
    path: str
    type: ChangelogType
    old_value: Any = None
    new_value: Any = None


@dataclass
class ChangelogResult:
    v1: Optional[str]
    v2: Optional[str]
    entries: List[ChangelogEntry] = field(default_factory=list)
    summary: List[ChangelogEntry] = field(default_factory=list)

    def has_changes(self) -> bool:
        return bool(self.entries)

    def counts(self, lane: str = "summary") -> Dict[str, int]:
        entries = self.summary if lane == "summary" else self.entries
        return {
            "added": sum(1 for e in entries if e.type is ChangelogType.added),
            "removed": sum(1 for e in entries if e.type is ChangelogType.removed),
            "updated": sum(1 for e in entries if e.type is ChangelogType.updated),
        }


# ---------------------------------------------------------------------------
# normalization (reference changelog/normalize.py natural-key table)
# ---------------------------------------------------------------------------

_NATURAL_KEYS = {
    ("schema",): "name",
    ("slaProperties",): "property",
    ("servers",): "server",
    ("support",): "channel",
    ("roles",): "role",
    ("team", "members"): "username",
}
# containers whose items key by these regardless of depth
_ANY_DEPTH_KEYS = {"properties": "name", "customProperties": "property",
                   "roles": "role", "authoritativeDefinitions": "url"}


def _key_for(path: Tuple[str, ...]) -> Optional[str]:
    if path in _NATURAL_KEYS:
        return _NATURAL_KEYS[path]
    if path and path[-1] in _ANY_DEPTH_KEYS:
        return _ANY_DEPTH_KEYS[path[-1]]
    return None


def normalize(doc: Any, path: Tuple[str, ...] = ()) -> Any:
    if isinstance(doc, dict):
        return {k: normalize(v, path + (k,)) for k, v in doc.items()}
    if isinstance(doc, list):
        key_field = _key_for(path)
        if key_field and all(isinstance(i, dict) for i in doc):
            out = {}
            for i, item in enumerate(doc):
                key = item.get(key_field, f"__pos_{i}__")
                out[str(key)] = normalize(
                    {k: v for k, v in item.items() if k != key_field}, path)
            return out
        return [normalize(i, path) for i in doc]
    return doc


# ---------------------------------------------------------------------------
# recursive diff
# ---------------------------------------------------------------------------

def _expand(payload: Any, ctype: ChangelogType, path: List[str],
            out: List[ChangelogEntry]) -> None:
    """Whole added/removed object -> a path-only entry per dict node and a
    valued entry per scalar leaf (reference _expand_to_entries)."""
    out.append(ChangelogEntry(".".join(path), ctype))
    if not isinstance(payload, dict):
        out[-1].new_value = payload if ctype is ChangelogType.added else None
        out[-1].old_value = payload if ctype is ChangelogType.removed else None
        return
    for k, v in payload.items():
        segs = path + [str(k)]
        if isinstance(v, dict):
            _expand(v, ctype, segs, out)
        else:
            e = ChangelogEntry(".".join(segs), ctype)
            if ctype is ChangelogType.added:
                e.new_value = v
            else:
                e.old_value = v
            out.append(e)


@dataclass
class _Event:
    """One raw diff event, before lane shaping."""
    kind: str  # dict_added | dict_removed | scalar_added | scalar_removed | changed | item_added | item_removed
    path: List[str]
    old: Any = None
    new: Any = None


def _diff(a: Any, b: Any, path: List[str], events: List[_Event]) -> None:
    if isinstance(a, dict) and isinstance(b, dict):
        for k in a:
            if k not in b:
                kind = "dict_removed" if isinstance(a[k], dict) else "scalar_removed"
                events.append(_Event(kind, path + [str(k)], old=a[k]))
        for k in b:
            if k not in a:
                kind = "dict_added" if isinstance(b[k], dict) else "scalar_added"
                events.append(_Event(kind, path + [str(k)], new=b[k]))
        for k in a:
            if k in b:
                _diff(a[k], b[k], path + [str(k)], events)
        return
    if isinstance(a, list) and isinstance(b, list):
        # scalar lists (tags) diff as multisets; the value becomes the final
        # detail path segment, the list itself the summary path
        if all(not isinstance(x, (dict, list)) for x in a + b):
            a_rest = list(a)
            for x in b:
                if x in a_rest:
                    a_rest.remove(x)
                else:
                    events.append(_Event("item_added", path, new=x))
            b_rest = list(b)
            for x in a:
                if x in b_rest:
                    b_rest.remove(x)
                else:
                    events.append(_Event("item_removed", path, old=x))
            return
        if len(a) == len(b):
            for i, (x, y) in enumerate(zip(a, b)):
                _diff(x, y, path + [str(i)], events)
            return
        if a != b:
            events.append(_Event("changed", path, old=a, new=b))
        return
    if a != b:
        events.append(_Event("changed", path, old=a, new=b))


def diff_contracts(v1_doc: Dict[str, Any], v2_doc: Dict[str, Any],
                   v1_label: Optional[str] = None,
                   v2_label: Optional[str] = None) -> ChangelogResult:
    events: List[_Event] = []
    _diff(normalize(v1_doc), normalize(v2_doc), [], events)

    detail: List[ChangelogEntry] = []
    for ev in events:
        if ev.kind == "dict_added":
            _expand(ev.new, ChangelogType.added, ev.path, detail)
        elif ev.kind == "dict_removed":
            _expand(ev.old, ChangelogType.removed, ev.path, detail)
        elif ev.kind == "scalar_added":
            detail.append(ChangelogEntry(".".join(ev.path), ChangelogType.added,
                                         new_value=ev.new))
        elif ev.kind == "scalar_removed":
            detail.append(ChangelogEntry(".".join(ev.path), ChangelogType.removed,
                                         old_value=ev.old))
        elif ev.kind == "changed":
            detail.append(ChangelogEntry(".".join(ev.path), ChangelogType.updated,
                                         old_value=ev.old, new_value=ev.new))
        elif ev.kind == "item_added":
            detail.append(ChangelogEntry(".".join(ev.path + [str(ev.new)]),
                                         ChangelogType.added))
        elif ev.kind == "item_removed":
            detail.append(ChangelogEntry(".".join(ev.path + [str(ev.old)]),
                                         ChangelogType.removed))
    detail.sort(key=lambda e: e.path)

    groups: Dict[Tuple[str, ...], ChangelogType] = {}
    order: List[Tuple[str, ...]] = []
    for ev in events:
        if ev.kind in ("dict_added", "dict_removed"):
            segs = tuple(ev.path)
            ctype = (ChangelogType.added if ev.kind == "dict_added"
                     else ChangelogType.removed)
        elif ev.kind in ("item_added", "item_removed"):
            segs = tuple(ev.path)
            ctype = (ChangelogType.added if ev.kind == "item_added"
                     else ChangelogType.removed)
        else:
            segs = tuple(ev.path[:-1]) if len(ev.path) > 1 else tuple(ev.path)
            ctype = {"scalar_added": ChangelogType.added,
                     "scalar_removed": ChangelogType.removed,
                     "changed": ChangelogType.updated}[ev.kind]
        if segs not in groups:
            groups[segs] = ctype
            order.append(segs)
        elif groups[segs] is not ctype:
            groups[segs] = ChangelogType.updated
    summary = [ChangelogEntry(".".join(segs), groups[segs])
               for segs in sorted(groups, key=".".join)]

    return ChangelogResult(v1=v1_label, v2=v2_label, entries=detail,
                           summary=summary)


def build_changelog(v1_path: str, v2_path: str) -> ChangelogResult:
    with open(v1_path, "r", encoding="utf-8") as f:
        v1 = yaml.safe_load(f.read())
    with open(v2_path, "r", encoding="utf-8") as f:
        v2 = yaml.safe_load(f.read())
    if not isinstance(v1, dict) or not isinstance(v2, dict):
        raise ValueError("both contracts must be YAML mappings")
    return diff_contracts(v1, v2, v1_label=v1_path, v2_label=v2_path)


# ---------------------------------------------------------------------------
# text rendering (plain-ASCII counterpart of the reference's rich tables)
# ---------------------------------------------------------------------------

def _table(rows: List[List[str]], headers: List[str]) -> str:
    widths = [max(len(h), *(len(r[i]) for r in rows)) if rows else len(h)
              for i, h in enumerate(headers)]
    def line(cells):
        return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"
    sep = "|" + "|".join("-" * (w + 2) for w in widths) + "|"
    return "\n".join([line(headers), sep] + [line(r) for r in rows])


def render_text(result: ChangelogResult) -> str:
    c = result.counts("summary")
    out = [f"Changelog {result.v1 or 'v1'} -> {result.v2 or 'v2'}", "",
           "Summary",
           f"[ {c['added']} Added ]  [ {c['updated']} Updated ]  [ {c['removed']} Removed ]",
           _table([[e.type.value, e.path] for e in result.summary],
                  ["Change", "Field"]),
           "", "Details",
           _table([[e.type.value, e.path,
                    "" if e.old_value is None else str(e.old_value),
                    "" if e.new_value is None else str(e.new_value)]
                   for e in result.entries],
                  ["Change", "Path", "Old Value", "New Value"])]
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# breaking-change classification (beyond-reference: the reference changelog
# lists changes but does not classify them; CI pipelines need the verdict)
# ---------------------------------------------------------------------------

# consumer-perspective rules: a change is BREAKING when existing consumers
# of the data can stop working — schema removals, type changes, and
# constraint TIGHTENING (producers may now reject/alter what consumers
# relied on receiving). Additions and constraint loosening are safe.
_TYPE_KEYS = ("logicaltype", "physicaltype")
_TIGHTEN_UP = ("minlength", "minimum", "exclusiveminimum")   # raising breaks
_TIGHTEN_DOWN = ("maxlength", "maximum", "exclusivemaximum")  # lowering breaks


_LOOSEN_REMOVAL_LEAVES = frozenset((
    "pattern", "minlength", "maxlength", "minimum", "maximum",
    "exclusiveminimum", "exclusivemaximum", "quality", "description",
    "tags", "examples", "logicaltypeoptions",
))
_NONBREAKING_SUBTREES = frozenset(("quality", "tags", "examples",
                                   "description", "logicaltypeoptions"))


def _name_positions(segs: List[str]) -> set:
    """Indices in a schema path that are model/property NAMES, not attribute
    keys — a column literally named 'description' or 'tags' must never be
    classified by the attribute-key tables."""
    names = set()
    for i in range(len(segs)):
        if i == 1 and segs[0] == "schema":
            names.add(i)  # model name
        elif i > 0 and segs[i - 1] == "properties":
            names.add(i)  # property name (any nesting depth)
    return names


def is_breaking(entry: ChangelogEntry) -> bool:
    path = entry.path.lower()
    in_schema = path.startswith("schema")
    leaf = path.rsplit(".", 1)[-1]
    if entry.type is ChangelogType.removed:
        # structural classification (not substring matching): removing a
        # model or property node breaks readers regardless of its name;
        # removing a constraint ATTRIBUTE (pattern, max_length, quality…)
        # only loosens.
        if not in_schema:
            return False
        segs = path.split(".")
        names = _name_positions(segs)
        if len(segs) - 1 in names or len(segs) == 1:
            return True  # the removed node IS a model/property (or all of schema)
        # attribute leaf/subtree under a (possibly removed) property:
        # ignore name positions when looking for non-breaking subtrees
        if any(segs[i] in _NONBREAKING_SUBTREES
               for i in range(len(segs) - 1) if i not in names):
            return False
        return leaf not in _LOOSEN_REMOVAL_LEAVES
    if entry.type is ChangelogType.added:
        # new required field: existing producers' data fails validation
        return in_schema and leaf == "required" and bool(entry.new_value)
    # Updated
    if not in_schema:
        return False
    if leaf in _TYPE_KEYS:
        return True
    if leaf == "required":
        return bool(entry.new_value) and not bool(entry.old_value)
    if leaf in _TIGHTEN_UP:
        try:
            return float(entry.new_value) > float(entry.old_value)
        except (TypeError, ValueError):
            return True
    if leaf in _TIGHTEN_DOWN:
        try:
            return float(entry.new_value) < float(entry.old_value)
        except (TypeError, ValueError):
            return True
    if leaf == "pattern":
        return True  # regex change: no containment check, assume breaking
    if "enum" in path:
        return True  # enum member changed in place
    return False


def breaking_changes(result: ChangelogResult) -> List[ChangelogEntry]:
    """The subset of DETAIL entries that break existing consumers."""
    return [e for e in result.entries if is_breaking(e)]
