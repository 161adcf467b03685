"""Dict / iteration helpers (reference ``rex/utils/dict.py`` and
``rex/utils/iteration.py`` semantics)."""

from __future__ import annotations

from typing import Any, Dict, Iterable, Iterator, List, Sequence


def get_dict_content(d: Dict[str, Any], dotted_path: str) -> Any:
    """Dotted-path getter: ``get_dict_content({'a': {'b': 1}}, 'a.b') == 1``
    (reference ``dict.py:7-11``)."""
    cur: Any = d
    for key in dotted_path.split("."):
        cur = cur[key]
    return cur


def flatten_dict(
    d: Dict[str, Any], parent_key: str = "", sep: str = "."
) -> Dict[str, Any]:
    """Nested dict -> flat dotted-key dict (reference ``dict.py:14-22``)."""
    items: List = []
    for k, v in d.items():
        key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, dict):
            items.extend(flatten_dict(v, key, sep=sep).items())
        else:
            items.append((key, v))
    return dict(items)


def flatten_all_iter(nested: Iterable) -> Iterator[Any]:
    """Depth-first flatten of arbitrarily nested lists
    (reference ``iteration.py:4-9``; tuples are yielded as-is there,
    so only ``list`` recurses)."""
    for el in nested:
        if isinstance(el, list):
            yield from flatten_all_iter(el)
        else:
            yield el


def windowed_queue_iter(
    seq: Sequence,
    window: int,
    stride: int = 0,
    drop_last: bool = False,
) -> Iterator[List]:
    """Sliding/stepping windows over a sequence (reference
    ``iteration.py:12-28``): stride defaults to the window size; a
    sequence no longer than the window is yielded whole; ``drop_last``
    suppresses the ragged tail windows."""
    if not stride:
        stride = window
    n = len(seq)
    if n <= window:
        yield list(seq)
        return
    max_limit = (n - window + 1) if drop_last else n
    for i in range(0, max_limit, stride):
        yield list(seq[i : i + window])
