"""Asset path resolution.

The reference ships meshes under ``objects/`` and style images under
``imgs/`` and its CLIs default to relative paths like
``./objects/cow_mesh/cow.obj`` (first_approach.py:26-27). This repo does not
vendor those binary assets; instead paths are resolved against a search list
so the same CLI defaults work when the reference checkout is mounted
(read-only) at ``/root/reference``. Set ``ST3D_ASSET_ROOTS`` (colon-separated)
to add roots.
"""

from __future__ import annotations

import os
from typing import List

_DEFAULT_ROOTS = [
    ".",
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "/root/reference",
]


def asset_roots() -> List[str]:
    env = os.environ.get("ST3D_ASSET_ROOTS")
    roots = env.split(":") if env else []
    return roots + _DEFAULT_ROOTS


def resolve_asset(path: str) -> str:
    """Return the first existing match of ``path`` under the asset roots.

    Absolute existing paths pass through; otherwise each root is tried with
    the (possibly ``./``-prefixed) relative path. Raises FileNotFoundError
    listing the attempted locations.
    """
    if os.path.isfile(path):
        return path
    rel = path[2:] if path.startswith("./") else path
    tried = [path]
    for root in asset_roots():
        cand = os.path.join(root, rel)
        tried.append(cand)
        if os.path.isfile(cand):
            return cand
    raise FileNotFoundError(
        f"asset {path!r} not found; tried: " + ", ".join(tried)
    )
