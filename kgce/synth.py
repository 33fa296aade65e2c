"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1).

Everything is a pure function of the seed — no wall clock, no external
data — so oracle and Spark runs see byte-identical inputs.  Knobs:
page count, hot-domain Zipf skew, mention density, long-sentence fraction.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

# lowercase filler vocabulary (never tagged by the rule tagger)
_FILLER = (
    "the quick brown fox jumps over lazy dog while many small towns report "
    "steady growth in local trade and new markets open near old rivers with "
    "farmers selling fresh goods to visitors from nearby villages every week"
).split()

# capitalized entity surface forms, spread across the rule-tagger type buckets
_ENTITIES = [
    "Alice", "Bob", "Carol", "David", "Erik", "Frank",  # A-F -> per
    "Geneva", "Hamburg", "Istanbul", "Jakarta", "Kyoto", "Lisbon", "Madrid",  # G-M -> loc
    "Nokia", "Oracle", "Pfizer", "Qualcomm", "Rosneft", "Siemens",  # N-S -> org
    "Tesla", "Uber", "Vanguard", "Walmart", "Xerox", "Yamaha", "Zenith",  # T-Z -> misc
]

_DOMAIN_POOL = [f"site{i:03d}.example" for i in range(200)]

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _sentence(rng: random.Random, n_tokens: int, mention_density: float) -> str:
    toks = []
    i = 0
    while i < n_tokens:
        if rng.random() < mention_density:
            # entity mention of 1-3 capitalized tokens
            span = rng.randint(1, 3)
            for _ in range(min(span, n_tokens - i)):
                toks.append(rng.choice(_ENTITIES))
                i += 1
        else:
            toks.append(rng.choice(_FILLER))
            i += 1
    return " ".join(toks) + rng.choice([".", ".", ".", "!", "?"])


def gen_pages(
    n_pages: int,
    seed: int = 13,
    zipf_a: float = 1.5,
    mention_density: float = 0.18,
    long_frac: float = 0.05,
    max_sents: int = 8,
) -> list[dict]:
    """Rows for the ``pages(url, warc_ts, html, text, lang)`` table."""
    rng = random.Random(seed)
    # Zipf-ish domain weights: domain k gets weight 1/(k+1)^a → hot-domain skew
    weights = [1.0 / (k + 1) ** zipf_a for k in range(len(_DOMAIN_POOL))]
    total = sum(weights)
    cum = []
    acc = 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)

    def pick_domain() -> str:
        r = rng.random()
        for k, c in enumerate(cum):
            if r <= c:
                return _DOMAIN_POOL[k]
        return _DOMAIN_POOL[-1]

    rows = []
    for i in range(n_pages):
        domain = pick_domain()
        n_sents = rng.randint(1, max_sents)
        sents = []
        for _ in range(n_sents):
            if rng.random() < long_frac:
                n_tok = rng.randint(140, 220)  # forces chunk+restitch paths
            else:
                n_tok = rng.randint(4, 25)
            sents.append(_sentence(rng, n_tok, mention_density))
        text = " ".join(sents)
        rows.append(
            {
                "url": f"https://{domain}/page/{i}",
                "warc_ts": EPOCH + timedelta(seconds=i * 37),
                "html": ("<html><body>" + text + "</body></html>").encode("utf-8"),
                "text": text,
                "lang": rng.choice(["en", "en", "en", "de", "fr"]),
            }
        )
    return rows


def gen_bio_fixture(n_sents: int, seed: int = 13, max_len: int = 20) -> list[dict]:
    """Adversarial BIO fixture (FIXTURES.md F3): gold + corrupted pred labels.

    Corruptions hit every branch of BIO repair, span decode and the
    strict/relax/one-credit eval: orphan ``I-``, ``O I-x``, ``B-x I-y``,
    leading ``I-``, boundary off-by-one, type swap, trailing open span.
    """
    rng = random.Random(seed)
    types = ["per", "loc", "org", "misc"]
    rows = []
    for s in range(n_sents):
        n = rng.randint(1, max_len)
        gold = []
        i = 0
        while i < n:
            if rng.random() < 0.35:
                t = rng.choice(types)
                span = min(rng.randint(1, 3), n - i)
                gold.append("B-" + t)
                gold.extend(["I-" + t] * (span - 1))
                i += span
            else:
                gold.append("O")
                i += 1
        pred = list(gold)
        for _ in range(rng.randint(0, 3)):
            k = rng.randrange(n)
            mode = rng.randrange(6)
            t = rng.choice(types)
            if mode == 0:
                pred[k] = "I-" + t  # orphan / O I-x / B-x I-y
            elif mode == 1:
                pred[k] = "O"  # boundary clip / span split
            elif mode == 2:
                pred[k] = "B-" + t  # type swap / span split
            elif mode == 3 and k + 1 < n:
                pred[k], pred[k + 1] = pred[k + 1], pred[k]  # off-by-one
            elif mode == 4:
                pred[k] = "I-" + t.upper()[:1].lower() + t[1:]  # no-op-ish
            else:
                pred[n - 1] = "B-" + t  # trailing open span
        rows.append(
            {
                "doc_id": f"doc{s // 10}",
                "sent_id": s,
                "tokens": [f"w{j}" for j in range(n)],
                "gold_labels": gold,
                "pred_labels": pred,
            }
        )
    return rows


def gen_linked_pages(
    n_pages: int,
    seed: int = 13,
    max_links: int = 6,
    junk_frac: float = 0.2,
    **gen_kw,
) -> list[dict]:
    """``gen_pages`` plus a deterministic ``<nav>`` block of ``<a href>``
    links per page (FIXTURES-style F1 extension for the link-graph
    operators).

    Link targets follow the same Zipf skew as the domain pool (hot
    pages collect in-links, giving PageRank a non-uniform fixed point).
    Href forms are mixed on purpose — absolute, root-relative,
    path-relative (incl. ``../`` dot segments), protocol-relative — and
    a ``junk_frac`` share of non-navigational refs (mailto:,
    javascript:, bare fragments) that extract_links must NULL out.
    Anchor texts land in ``text`` too, so html_to_text(html) == text
    byte-identically (the pipeline's per-row invariant).
    """
    rows = gen_pages(n_pages, seed=seed, **gen_kw)
    rng = random.Random(seed * 7919 + 17)
    for i, row in enumerate(rows):
        k = rng.randint(0, max_links)
        anchors, frags = [], []
        for _ in range(k):
            if rng.random() < junk_frac:
                href = rng.choice(
                    ["mailto:ab@example.org", "javascript:void(0)", "#top", ""]
                )
                anchor = rng.choice(["contact", "top", "more info"])
            else:
                j = int(len(rows) * rng.random() ** 2.5)  # Zipf-ish hot targets
                target = rows[min(j, len(rows) - 1)]["url"]
                form = rng.randrange(4)
                if form == 0:
                    href = target  # absolute
                elif form == 1:
                    href = target.split(".example", 1)[1]  # root-relative /page/j
                elif form == 2:
                    href = "../" + target.rsplit("/", 2)[-2] + "/" + target.rsplit("/", 1)[-1]
                else:
                    href = target.split("https:", 1)[1]  # protocol-relative
                anchor = " ".join(
                    rng.choice(_ENTITIES) for _ in range(rng.randint(1, 2))
                )
            anchors.append(anchor)
            frags.append(f'<a href="{href}">{anchor}</a>')
        nav = (" <nav>" + " ".join(frags) + "</nav>") if frags else ""
        body = row["text"] + nav
        row["html"] = ("<html><body>" + body + "</body></html>").encode("utf-8")
        row["text"] = (row["text"] + " " + " ".join(a for a in anchors)).strip()
    return rows
