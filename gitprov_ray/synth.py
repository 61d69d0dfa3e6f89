"""Deterministic seeded corpus generators (FIXTURES.md).

Two corpus builders share one event-script representation and one html
renderer:

* :func:`gen_corpus` — seeded synthetic corpus (tiny/small/bench scales) with
  every FIXTURES.md §5 edge case baked in.
* :func:`script_from_doc_row` / :func:`contributors_for_sources` — pure
  per-row derivation of the same shapes from the driver's
  ``documents.parquet`` tables, so the flagship pipeline and its oracle run
  over ``/root/testdata/sf*`` without any external data. Pure functions of
  the row → safe to evaluate inside distributed ``map_batches``.

Everything is deterministic: fixed seed, no wall clock, timestamps UTC-naive
whole seconds. A snapshot's id is ``sha1(f"{url}|{ts.isoformat()}")`` so the
engine can re-derive it from the pages table alone.
"""

from __future__ import annotations

import hashlib
import html as _html
import random
from datetime import datetime, timedelta

import pyarrow as pa

from . import schemas

BASE_TS = datetime(2020, 1, 1, 0, 0, 0)

# Global contributor pool. Edge cases (FIXTURES.md §3/§5): a login with a
# space, a null email, a null display name (ST2 no-name fallback), a
# non-ASCII name, an Organization.
CONTRIBUTOR_POOL = [
    {"login": "user0", "agent_type": "User", "email": "user0@mail.example", "name": "User Zero"},
    {"login": "user1", "agent_type": "User", "email": "user1@mail.example", "name": "User One"},
    {"login": "user2", "agent_type": "User", "email": None, "name": "User Two"},
    {"login": "user3", "agent_type": "User", "email": "user3@mail.example", "name": None},
    {"login": "mona lisa", "agent_type": "User", "email": "mona@mail.example", "name": "Mona Lisa"},
    {"login": "user5", "agent_type": "Organization", "email": None, "name": "Org Five"},
    {"login": "user6", "agent_type": "User", "email": "user6@mail.example", "name": "José Müller"},
    {"login": "user7", "agent_type": "User", "email": "user7@mail.example", "name": "User Seven"},
    {"login": "user8", "agent_type": "User", "email": "user8@mail.example", "name": None},
    {"login": "user9", "agent_type": "User", "email": "user9@mail.example", "name": "User Nine"},
]

_WORDS = (
    "stream shuffle arrow batch block graph triple entity agent activity "
    "lineage snapshot crawl page mention link canonical minhash salt skew"
).split()


def snapshot_sha(url: str, ts: datetime) -> str:
    return hashlib.sha1(f"{url}|{ts.isoformat()}".encode()).hexdigest()


def _avatar(login: str) -> str:
    return f"https://img.example/{login.replace(' ', '-')}.png"


def contributions_for(login: str, graph: str) -> int:
    h = hashlib.sha1(f"{login}|{graph}".encode()).hexdigest()
    return int(h[:4], 16) % 100 + 1


def contributors_for_sources(sources: list[str]) -> pa.Table:
    """Deterministic per-graph contributor table over a list of graphs."""
    rows = []
    for g in sorted(set(sources)):
        for c in CONTRIBUTOR_POOL:
            rows.append(
                {
                    "graph": g,
                    "login": c["login"],
                    "agent_type": c["agent_type"],
                    "contributions": contributions_for(c["login"], g),
                    "email": c["email"],
                    "avatar_url": _avatar(c["login"]),
                    "name": c["name"],
                }
            )
    return pa.Table.from_pylist(rows, schema=schemas.CONTRIBUTORS)


# ---------------------------------------------------------------------------
# html rendering (the inverse of extract.parse_page, byte-stable)
# ---------------------------------------------------------------------------

def render_html(snap: dict, body_words: list[str]) -> bytes:
    """Render one snapshot dict into deterministic html bytes."""
    e = lambda s: _html.escape(s, quote=True)
    res_items = "".join(
        '<li class="res" data-name="{n}" data-status="{s}" data-additions="{a}"'
        ' data-changes="{c}" data-deletions="{d}">{n} was {s}</li>'.format(
            n=e(r["name"]), s=e(r["status"]), a=r["additions"], c=r["changes"],
            d=r["deletions"],
        )
        for r in snap["resources"]
    )
    parents = "".join(
        f'<a rel="parent" href="#{p}">parent {p[:8]}</a>' for p in snap["parents"]
    )
    paras = "".join(
        "<p>" + e(" ".join(body_words[i : i + 8])) + "</p>"
        for i in range(0, len(body_words), 8)
    )
    return (
        "<html><head>"
        f"<title>{e(snap['label'])}</title>"
        f"<meta name=\"author\" content=\"{e(snap['author'] or '')}\">"
        f"<meta name=\"author-name\" content=\"{e(snap['author_name'] or '')}\">"
        "<script>var t=1;</script><style>.x{color:red}</style>"
        "</head><body>"
        '<nav><a href="/">home</a> <a href="/about">about</a></nav>'
        f"<h1>{e(snap['label'])}</h1>"
        f"{paras}"
        f'<ul class="resources">{res_items}</ul>'
        f'<div class="parents">{parents}</div>'
        "<footer>fixture boilerplate footer</footer>"
        "</body></html>"
    ).encode("utf-8")


# ---------------------------------------------------------------------------
# seeded synthetic corpus
# ---------------------------------------------------------------------------

_EDGE_RESOURCES = [
    "src/main.py",
    "docs/read me.txt",
    "a\\b.c",
    "weird:name?x=1",
    "héllo.txt",
    "README",
]


def gen_corpus(n_urls: int = 12, seed: int = 42, n_domains: int | None = None):
    """Seeded event script → (pages, revisions, contributors) Arrow tables.

    Hot-key skew is intentional: domain 0 holds ~20% of urls (FIXTURES.md §5
    row 7). Every §5 edge case is forced into urls 0-3 so even the tiny
    corpus covers them.
    """
    rng = random.Random(seed)
    if n_domains is None:
        n_domains = max(2, n_urls // 6)
    domains = [f"site{i}.example" for i in range(n_domains)]

    page_rows: list[dict] = []
    rev_rows: list[dict] = []

    for k in range(n_urls):
        # Zipf-ish domain pick: ~20% to domain 0.
        dom = domains[0] if rng.random() < 0.2 else domains[rng.randrange(n_domains)]
        url = f"https://{dom}/p/{k}"
        n_snap = rng.randint(1, 8)
        ts = BASE_TS + timedelta(seconds=rng.randrange(0, 10_000_000))
        alive: set[str] = set()
        shas: list[str] = []
        respool = [rng.choice(_EDGE_RESOURCES)] + [
            f"res/{rng.randrange(4)}/f{rng.randrange(6)}.dat" for _ in range(3)
        ]

        forced = None
        if k == 0:
            # added → modified → removed → re-added chain on an edge name
            forced = [("src/main.py", "added"), ("src/main.py", "modified"),
                      ("src/main.py", "removed"), ("src/main.py", "added")]
            n_snap = max(n_snap, 4)
        elif k == 1:
            # modified-without-prior (quirk 4 → quarantined, no usage/derivation)
            forced = [("ghost.txt", "modified")]

        for i in range(n_snap):
            ts = ts + timedelta(seconds=rng.randrange(60, 100_000))
            sha = snapshot_sha(url, ts)
            c = CONTRIBUTOR_POOL[rng.randrange(len(CONTRIBUTOR_POOL))]
            if rng.random() < 0.12:
                author, author_name = None, (c["name"] or "User Zero")
            else:
                author, author_name = c["login"], c["name"]
            label = f"snapshot {i} of page {k}" + (" — héllo" if k % 5 == 0 else "")

            events = []
            if forced and i < len(forced):
                name, status = forced[i]
                events.append((name, status))
            for _ in range(rng.randint(1, 3)):
                name = respool[rng.randrange(len(respool))]
                if name in {n for n, _ in events}:
                    continue
                if name not in alive:
                    events.append((name, "added"))
                else:
                    events.append((name, "modified" if rng.random() < 0.8 else "removed"))
            for name, status in events:
                if status == "added":
                    alive.add(name)
                elif status == "removed":
                    alive.discard(name)

            if k == 2 and i == n_snap - 1 and len(shas) >= 2:
                parents = [shas[-1], shas[0]]          # merge: 2 parents
            else:
                parents = [shas[-1]] if shas else []   # root: 0 parents
            shas.append(sha)

            resources = [
                {
                    "name": name, "status": status,
                    "additions": rng.randrange(0, 50),
                    "changes": rng.randrange(0, 20),
                    "deletions": rng.randrange(0, 30),
                }
                for name, status in events
            ]
            snap = {
                "label": label, "author": author, "author_name": author_name,
                "resources": resources, "parents": parents,
            }
            body = [_WORDS[rng.randrange(len(_WORDS))] for _ in range(24)]
            lang = rng.choice(["en", "de", "fr", "und"])
            html = render_html(snap, body)
            page_rows.append(
                {"url": url, "warc_ts": ts, "html": html, "text": "", "lang": lang}
            )
            if k == 3 and i == 0:
                # exact duplicate (url, warc_ts) snapshot → pre-lag dedup test
                page_rows.append(dict(page_rows[-1]))
            for seq, r in enumerate(resources):
                rev_rows.append(
                    {
                        "graph": dom, "page_key": r["name"], "snapshot_id": sha,
                        "ts": ts, "author": author, "author_name": author_name,
                        "label": label, "change_status": r["status"],
                        "event_seq": seq,
                        "additions": r["additions"], "changes": r["changes"],
                        "deletions": r["deletions"], "parents": parents, "url": url,
                    }
                )
                if k == 3 and i == 0:
                    rev_rows.append(dict(rev_rows[-1]))

    # extractor edge pages: empty html + boilerplate-only html (no events)
    page_rows.append({"url": f"https://{domains[0]}/p/empty", "warc_ts": BASE_TS,
                      "html": b"", "text": "", "lang": "und"})
    page_rows.append({"url": f"https://{domains[0]}/p/boiler", "warc_ts": BASE_TS,
                      "html": b"<html><head><script>x</script></head><body><nav>n</nav>"
                              b"<footer>f</footer></body></html>", "text": "", "lang": "en"})

    pages = pa.Table.from_pylist(page_rows, schema=schemas.PAGES)
    revisions = pa.Table.from_pylist(rev_rows, schema=schemas.REVISIONS)
    contributors = contributors_for_sources(domains)
    return pages, revisions, contributors


# ---------------------------------------------------------------------------
# documents.parquet → pages derivation (pure per-row, distributable)
# ---------------------------------------------------------------------------

def script_from_doc_row(doc_id: int, text: str, lang: str, source: str) -> list[dict]:
    """Derive the deterministic snapshot list for one document row.

    graph = source; url = https://{source}.example/doc/{doc_id};
    1 + doc_id%3 snapshots; resources/authors/counters are pure hashes of
    (doc_id, snapshot index). Mirrors gen_corpus shapes without shared RNG
    state so it can run inside map_batches.
    """
    graph = f"{source}.example"          # == url host, so graph_of_url agrees
    url = f"https://{graph}/doc/{doc_id}"
    n_snap = 1 + (doc_id % 3)
    words = text.split()
    out = []
    alive: set[str] = set()
    shas: list[str] = []
    for i in range(n_snap):
        ts = BASE_TS + timedelta(seconds=(doc_id * 977 + i * 131) % 50_000_000)
        sha = snapshot_sha(url, ts)
        ci = (doc_id * 7 + i) % len(CONTRIBUTOR_POOL)
        c = CONTRIBUTOR_POOL[ci]
        if (doc_id + i) % 17 == 0:
            author, author_name = None, (c["name"] or "User Zero")
        else:
            author, author_name = c["login"], c["name"]
        resources = []
        for j in range(1 + (doc_id + i) % 2):
            # names stable across snapshots so later snapshots modify/remove
            name = f"res/{(doc_id + j) % 5}/part {j}.txt"
            if name in alive:
                status = "removed" if (doc_id + i + j) % 7 == 0 else "modified"
            else:
                status = "added"
            if status == "added":
                alive.add(name)
            elif status == "removed":
                alive.discard(name)
            resources.append(
                {
                    "name": name, "status": status,
                    "additions": (doc_id + 3 * j) % 40,
                    "changes": (doc_id + i) % 15,
                    "deletions": (doc_id + 5 * j) % 25,
                }
            )
        parents = [shas[-1]] if shas else []
        shas.append(sha)
        out.append(
            {
                "url": url, "ts": ts, "sha": sha, "lang": lang, "graph": graph,
                "label": f"doc {doc_id} snapshot {i}",
                "author": author, "author_name": author_name,
                "resources": resources, "parents": parents,
                "body": words[: 24] if words else ["empty"],
            }
        )
    return out


def pages_rows_from_doc_row(doc_id: int, text: str, lang: str, source: str) -> list[dict]:
    rows = []
    for s in script_from_doc_row(doc_id, text, lang, source):
        rows.append(
            {
                "url": s["url"], "warc_ts": s["ts"],
                "html": render_html(s, s["body"]), "text": "", "lang": s["lang"],
            }
        )
    return rows


def revisions_rows_from_doc_row(doc_id: int, text: str, lang: str, source: str) -> list[dict]:
    rows = []
    for s in script_from_doc_row(doc_id, text, lang, source):
        for seq, r in enumerate(s["resources"]):
            rows.append(
                {
                    "graph": s["graph"], "page_key": r["name"],
                    "snapshot_id": s["sha"], "ts": s["ts"],
                    "author": s["author"], "author_name": s["author_name"],
                    "label": s["label"], "change_status": r["status"],
                    "event_seq": seq,
                    "additions": r["additions"], "changes": r["changes"],
                    "deletions": r["deletions"], "parents": s["parents"],
                    "url": s["url"],
                }
            )
    return rows
