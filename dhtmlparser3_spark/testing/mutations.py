"""Single source of truth for the corpus-mutation adversarial surface.

Used by BOTH the standalone hunts (scripts/hunt_fragment_mutations.py,
scripts/hunt_byte_mutations.py) and the CI pins
(tests/test_spark_extract.py) so a trap fragment added for one is
automatically hunted and pinned everywhere — the round-4 review found
three hand-maintained copies that had already drifted.

Two mutators:

* :func:`mutate_fragments` — string-level splice of adversarial HTML
  fragments into a rendered page (structural traps mid-document,
  surrounded by kilobytes of valid markup);
* :func:`mutate_bytes` — byte-level, four axes: span deletion (severs a
  tag mid-name / an entity mid-digits), truncation (mid-anything EOF),
  invalid-byte injection (the html column is BINARY; the documented
  decode policy is errors="replace", functions/extract.py), and a
  fragment splice at a byte offset (may split a rune).

Parity oracle in every consumer: the vendored reference run on the SAME
(replace-decoded) string; the scale contract for reference-raising
inputs is an error row, never a crash.
"""

from __future__ import annotations

import random

FRAGMENTS = [
    # structural
    "<b>", "</b>", "<i>", "</i>", "<div>", "</div>", "<p>", "</p>",
    "<br>", "<img src=x>", "<b><i>", "</b></i>", "<div><p>x",
    "</p></div>", "<b>x</b>", "</>", "<b b=1 b=2>", "<B>", "</B>",
    "<p><p>", "<div><div><span>", "</span></span>",
    # comments
    "<!-- c -->", "<!-- unterminated", "<!-->", "<!---->", "<!-- <b> -->",
    # entities (incl. truncated numeric forms and the 20-char cap)
    "&amp;", "&#65;", "&bogus;", "&;", "&amp", "&lt;b&gt;",
    "&#6", "&#x4",
    "&" + "x" * 25 + ";",
    "&AMP;", "&#xA;",
    # attributes / quoting traps
    "<a href='q'>t", '<a href="unterminated>', "<a href=bare&amp;>x</a>",
    '<q a="1" a="2">', "<q a = 1 >", "<q 'stray'>", '<q a=">">',
    # script/style with markup inside
    "<script>if(a<b){x()}</script>", "<style>p>span{}</style>",
    "</script>", "<script>",
    # doctype / cdata / pi
    "<!DOCTYPE html>", "<![CDATA[ <b> ]]>", "<?php echo '<i>'; ?>",
    # nonpair mis-use + nesting
    "<br>text</br>", "<img><b>cap</b></img>", "<hr/>", "<area>",
    # text-ish
    "x", " ", "\n", "<", ">", "\t", "﻿", "π€🎉", "\r\n",
    # anchors (subtree anchor machinery)
    '<a href="u"><b>deep</b></a>', '<a href="v">',
]

BAD_BYTES = [
    b"\xff",
    b"\xfe\xff",
    b"\xc3",          # lone UTF-8 lead byte
    b"\xe2\x82",      # truncated 3-byte sequence
    b"\x80\x81",      # bare continuation bytes
    b"\xf0\x9f",      # truncated 4-byte (emoji lead)
    b"\x00",          # NUL
]


def mutate_fragments(
    html: str, rng: random.Random, max_muts: int = 4
) -> str:
    """Splice 1..max_muts adversarial fragments at random positions."""
    for _ in range(rng.randint(1, max_muts)):
        pos = rng.randint(0, len(html))
        html = html[:pos] + rng.choice(FRAGMENTS) + html[pos:]
    return html


def mutate_bytes(
    hb: bytes, rng: random.Random, max_muts: int = 4
) -> bytes:
    """1..max_muts mutations drawn from all four axes, on raw BYTES."""
    for _ in range(rng.randint(1, max_muts)):
        op = rng.randrange(4)
        if op == 0 and len(hb) > 40:  # span deletion (can sever a tag)
            start = rng.randint(0, len(hb) - 20)
            end = start + rng.randint(1, min(400, len(hb) - start))
            hb = hb[:start] + hb[end:]
        elif op == 1 and len(hb) > 40:  # truncation (mid-anything EOF)
            hb = hb[: rng.randint(10, len(hb) - 1)]
        elif op == 2:  # invalid-byte injection
            pos = rng.randint(0, len(hb))
            hb = hb[:pos] + rng.choice(BAD_BYTES) + hb[pos:]
        else:  # fragment splice at a byte offset (may split a rune)
            pos = rng.randint(0, len(hb))
            hb = hb[:pos] + rng.choice(FRAGMENTS).encode("utf-8") + hb[pos:]
    return hb
