"""Jinja-templated SQL pipeline modules (reference ``src/config/templating.rs``).

Template functions (SURVEY §2.3):

* ``{{ sink(name="tbl") }}``      — captures the destination name; renders
  to "" (T2, reference templating.rs:30-42).
* ``{{ use_source("api") }}``     — captures the source name and renders to
  the *resolved temp-view name* (T3). This deliberately deviates from the
  reference, which renders the raw source name and later does a naive
  ``sql.replace(source, dest_table)`` that corrupts queries when the name
  appears as a substring (T5 hazard, SURVEY §7.4, reference
  ``src/cmd/mod.rs:146``). Rendering the final identifier makes rewriting
  unnecessary.

Module discovery (T1, reference templating.rs:89-127): recursive walk for
``*.sql`` case-insensitively, sorted by relative path.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from pathlib import Path

from jinja2 import Environment, FileSystemLoader


def list_sql_templates(modules_dir: str) -> list[str]:
    """Relative paths of every ``*.sql`` (case-insensitive), sorted."""
    root = Path(modules_dir)
    out = [
        str(p.relative_to(root))
        for p in root.rglob("*")
        if p.is_file() and p.suffix.lower() == ".sql"
    ]
    return sorted(out)


def unique_view_name(source_name: str) -> str:
    """Per-run unique temp-view name (S11, reference fetcher.rs:732-748 —
    nanoid suffix avoids collisions in the shared session)."""
    return f"{source_name}_{uuid.uuid4().hex[:10]}"


@dataclass
class RenderedModule:
    name: str
    sql: str
    sink: str | None
    sources: dict[str, str] = field(default_factory=dict)  # source name → view name


def render_module(
    modules_dir: str, rel_path: str, view_names: dict[str, str] | None = None
) -> RenderedModule:
    """Render one module with fresh capture state (T4: capture resets per
    render, reference templating.rs:60-87)."""
    capture: dict = {"sink": None, "sources": {}}
    fixed_views = view_names or {}

    def sink(name: str) -> str:
        capture["sink"] = name
        return ""

    def use_source(name: str) -> str:
        if name not in capture["sources"]:
            capture["sources"][name] = fixed_views.get(name) or unique_view_name(name)
        return capture["sources"][name]

    env = Environment(loader=FileSystemLoader(modules_dir))
    env.globals["sink"] = sink
    env.globals["use_source"] = use_source
    sql = env.get_template(rel_path).render()
    return RenderedModule(
        name=rel_path, sql=sql.strip(), sink=capture["sink"], sources=capture["sources"]
    )
