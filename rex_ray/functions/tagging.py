"""BIO / BMES tag-sequence decoding.

Semantics match the reference decoder (``rex/utils/tagging.py:4-79``):
B starts an entity (closing any open one), I/M extend only when the
type matches (an illegal transition closes the open entity early),
E closes, S emits a singleton (closing any open entity first), O
closes.  A trailing open entity is emitted with its accumulated length.

Tags without a type suffix (len <= 2) get type ``"default"``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

Entity = Tuple[str, str, Tuple[int, int]]


def _tag_type(tag: str) -> str:
    return tag[2:] if len(tag) > 2 else "default"


def get_entities_from_tags(
    chars: Sequence[str], tags: Sequence[str], join: str = ""
) -> List[Entity]:
    """Decode ``(surface, type, (start, end_plus_1))`` entities.

    ``chars`` and ``tags`` are truncated to the shorter of the two,
    mirroring the reference's leniency (tagging.py:15-18).

    ``join`` separates accumulated units in the surface.  The reference
    decoder is CHARACTER-oriented — with ``join=""`` and char input the
    output (including the trailing-entity end computed from the
    accumulated length) is bit-identical to it.  For word-token input
    pass ``join=" "``: the surface keeps its spaces and the trailing
    end is the token count (the char-length quirk would misplace it).
    """
    n = min(len(chars), len(tags))
    out: List[Entity] = []
    parts: List[str] = []
    ent_type = ""
    ent_start = -1

    def flush(end: int) -> None:
        nonlocal parts, ent_type, ent_start
        if parts:
            out.append((join.join(parts), ent_type, (ent_start, end)))
        parts, ent_type, ent_start = [], "", -1

    for i in range(n):
        char, tag = chars[i], tags[i]
        head = tag[:1]
        cur_type = _tag_type(tag)
        if head == "B":
            flush(i)
            parts, ent_type, ent_start = [char], cur_type, i
        elif head in ("I", "M"):
            if cur_type == ent_type and parts:
                parts.append(char)
            else:
                flush(i)  # illegal transition: early close
        elif head == "E":
            if cur_type == ent_type:
                parts.append(char)
            if parts:
                out.append((join.join(parts), ent_type, (ent_start, i + 1)))
            parts, ent_type, ent_start = [], "", -1
        elif head == "S":
            flush(i)
            out.append((char, cur_type, (i, i + 1)))
        else:  # O or anything else
            flush(i)

    if parts:
        # end from accumulated length: len of the joined string for the
        # reference char contract, token count for word tokens
        length = (
            sum(len(p) for p in parts) if join == "" else len(parts)
        )
        out.append(
            (join.join(parts), ent_type, (ent_start, ent_start + length))
        )
    return out


def count_illegal_tags(tags: Sequence[str]) -> int:
    """Count illegal transitions (reference ``tagging.py:82-111``)."""
    n_illegal = 0
    last_type = "default"
    last_head = "O"
    for tag in tags:
        cur_type = _tag_type(tag)
        head = tag[:1]
        if head in "IME":
            if last_head not in "BIM" or cur_type != last_type:
                n_illegal += 1
        elif head == "S" and last_head in "IM":
            n_illegal += 1
        last_type = cur_type
        last_head = head
    return n_illegal
