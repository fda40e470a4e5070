"""Corpus-mutation parity hunt, round-4 extension: three NEW mutation
axes beyond fragment splicing (scripts/hunt_fragment_mutations.py, 19k docs clean):

  1. span DELETION  — cut a random slice out of the page (can sever a
     tag mid-name, an attribute mid-quote, an entity mid-digits);
  2. TRUNCATION     — drop the page tail at a random position (the
     mid-tag / mid-comment / mid-entity EOF recovery paths);
  3. invalid BYTES  — inject non-UTF-8 byte runs into the binary column;
     parity contract: our pipeline decodes with errors="replace"
     (functions/extract.py:65-70, documented policy), so the oracle is
     the reference run on the SAME replace-decoded string.

Everything still flows through the FULL Spark extract path (Arrow
boundary, batch layout) and compares byte-identical per url.
"""
import random
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference/src")

import dhtmlparser3  # reference oracle

from dhtmlparser3_spark.pipeline.extract_job import extract_pages
from dhtmlparser3_spark.plans.session import get_spark
from dhtmlparser3_spark.sources import pages as pg

import os
SF = os.environ.get("HUNT_SF", "/root/testdata/sf0.001")
# max mutations per doc (compounding depth) — heavier values stack
# deletions/truncations/splices into heavily-corrupted documents
NMUT = int(os.environ.get("HUNT_MUTS", "4"))

BAD_BYTES = [
    b"\xff",
    b"\xfe\xff",
    b"\xc3",          # lone UTF-8 lead byte
    b"\xe2\x82",      # truncated 3-byte sequence
    b"\x80\x81",      # bare continuation bytes
    b"\xf0\x9f",      # truncated 4-byte (emoji lead)
    b"\x00",          # NUL
]

FRAGMENTS = [
    "<b>", "</b>", "<div><p>x", "<p><p>", "<!-- unterminated", "<!-->",
    "&;", "&amp", "&#6", "&#x4", "&" + "x" * 25 + ";",
    '<a href="unterminated>', '<q a=">">', "<q 'stray'>",
    "</script>", "<script>if(a<b){x()}</script>",
    "<br>text</br>", "</>", "﻿", "π€🎉",
]


def mutate_bytes(hb: bytes, rng: random.Random) -> bytes:
    """1-NMUT mutations drawn from all four axes, applied to raw BYTES."""
    for _ in range(rng.randint(1, NMUT)):
        op = rng.randrange(4)
        if op == 0 and len(hb) > 40:  # span deletion
            start = rng.randint(0, len(hb) - 20)
            end = start + rng.randint(1, min(400, len(hb) - start))
            hb = hb[:start] + hb[end:]
        elif op == 1 and len(hb) > 40:  # truncation
            hb = hb[: rng.randint(10, len(hb) - 1)]
        elif op == 2:  # invalid-byte injection
            pos = rng.randint(0, len(hb))
            hb = hb[:pos] + rng.choice(BAD_BYTES) + hb[pos:]
        else:  # fragment splice (decoded-safe: insert utf-8 bytes)
            pos = rng.randint(0, len(hb))
            hb = hb[:pos] + rng.choice(FRAGMENTS).encode("utf-8") + hb[pos:]
    return hb


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    variants = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(app_name="mutation-hunt2", cpus=8)
    base_rows = (
        pg.build_pages(spark, SF)
        .select("url", "warc_ts", "html", "lang")
        .collect()
    )
    print(f"base pages: {len(base_rows)}")
    rng = random.Random(seed)
    rows = []
    for r in base_rows:
        hb0 = bytes(r.html)
        for v in range(variants):
            rows.append(
                (f"{r.url}#m{v}", r.warc_ts, mutate_bytes(hb0, rng), "", r.lang)
            )
    print(f"mutated docs: {len(rows)}")
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    t0 = time.time()
    out = extract_pages(df, parallelism=16, with_metrics=False).select(
        "url", "extracted_text", "error"
    )
    got = {r.url: (r.extracted_text, r.error) for r in out.collect()}
    print(f"spark extract: {time.time() - t0:.1f}s, {len(got)} rows")

    bad = 0
    for (url, _ts, hb, _t, _l) in rows:
        # oracle sees the replace-decoded string — the documented policy
        h = hb.decode("utf-8", errors="replace")
        try:
            want = dhtmlparser3.parse(h).content_str()
            werr = None
        except Exception as e:
            want = None
            werr = type(e).__name__
        g_text, g_err = got[url]
        ok = (
            (want is not None and g_text == want and g_err is None)
            or (
                want is None
                and g_err is not None
                and g_err.startswith(werr)
            )
        )
        if not ok:
            bad += 1
            if bad <= 5:
                print("=" * 60)
                print("URL:", url)
                print("HTML:", repr(h[:600]))
                print("WANT:", repr(want if want is None else want[:400]), werr)
                print("GOT :", repr(g_text if g_text is None else g_text[:400]), g_err)
    print(f"RESULT: {bad} divergences / {len(rows)} docs (seed={seed})")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
