"""Deterministic identifier grammars.

These mirror the reference emitters' id minting exactly (the correctness
contract for triple P/R — SURVEY.md §2.9):

- base entity id:        ``file-`` + filename with ``[/\\. ]`` → ``-``
  (reference ``ProvenanceService.getStandardizedBaseFilename``,
  ProvenanceService.java:538-540)
- specialized entity id: base + ``_commit-{sha}``
  (``getStandardizedSpecializedFilename``, ProvenanceService.java:528-530)
- entity-name space fix: ``name.replace(' ', '-')`` applied at Entity mint
  (ProvenanceService.java:329)
- agent id:              login with ``' '`` → ``'-'`` (ProvenanceService.java:367-369)
- activity id:           ``commit-{sha}`` (ProvenanceService.java:312)
- association id:        ``association-{sha}`` (ProvenanceService.java:477)
- generation id:         ``generation-{base}-{sha}`` (ProvenanceService.java:410)
- invalidation id:       ``invalidation-{base}-{sha}`` (ProvenanceService.java:431)
- usage id:              ``usage-{base}-{sha}-{parentSha}`` (ProvenanceService.java:454)
- derivation id:         ``derivation-{specialized}-{parentSha}`` (ProvenanceService.java:496)
- communication id:      ``information-{parentSha}-{sha}`` (ProvenanceService.java:517)

Quirk 1 (replicated, NOT fixed): ``wasDerivedFrom`` cites generation id
``generation-{sha}`` and usage id ``usage-{sha}-{parentSha}``
(ProvenanceService.java:495,:497) which do NOT match the ids actually minted
by the generation/usage emitters (those embed the filename). The dangling
references are part of the parity contract.

Every id is finally passed through :func:`escape_ncname` before minting a
qualified name, mirroring ``QualifiedNameUtils.escapeToXsdLocalName``
(ProvenanceService.java:263-265). The escape used here is a deterministic
NCName-safe percent-style escape (documented divergence: byte-compat with
prov-model 0.7.3 is approximated; both the oracle and the engine share this
exact function, so in-repo parity is exact).
"""

from __future__ import annotations

import re

# Java regex "[/\\\\. ]" == the char class {'/', '\\', '.', ' '}
_BASE_NORM = re.compile(r"[/\\. ]")

# Characters allowed verbatim in our NCName-safe local parts: NCName start is
# a letter or underscore; continuation adds digits, '-', '.', '·' etc.  We
# keep the conservative ASCII subset plus any non-ASCII word chars and escape
# the rest as _xHH_ (deterministic, reversible-enough for uniqueness).
_NCNAME_OK = re.compile(r"[A-Za-z0-9_\-.À-￿]")


def escape_ncname(name: str) -> str:
    """Escape ``name`` into an XSD-NCName-safe local part.

    Deterministic stand-in for prov-model 0.7.3
    ``QualifiedNameUtils.escapeToXsdLocalName``: characters legal in an
    NCName pass through; anything else becomes ``_xHH_`` (lower-hex of the
    codepoint).  A leading character that cannot start an NCName (digit,
    '-', '.') is prefixed with '_'.
    """
    out = []
    for ch in name:
        if _NCNAME_OK.match(ch):
            out.append(ch)
        else:
            out.append("_x%02x_" % ord(ch))
    s = "".join(out)
    if s and (s[0].isdigit() or s[0] in "-."):
        s = "_" + s
    return s


def base_entity_name(filename: str) -> str:
    """``file-{filename with [/\\. ] → -}`` (ProvenanceService.java:538-540)."""
    return "file-" + _BASE_NORM.sub("-", filename)


def specialized_entity_name(filename: str, sha: str) -> str:
    """``{base}_commit-{sha}`` (ProvenanceService.java:528-530)."""
    return base_entity_name(filename) + "_commit-" + sha


def entity_id(name: str) -> str:
    """Entity mint applies ``' '→'-'`` then NCName escape (ProvenanceService.java:329)."""
    return escape_ncname(name.replace(" ", "-"))


def agent_id(login: str) -> str:
    """Agent id: login spaces→dashes, escaped (ProvenanceService.java:362,:367-369)."""
    return escape_ncname(login.replace(" ", "-"))


def activity_id(sha: str) -> str:
    return escape_ncname("commit-" + sha)


def association_id(sha: str) -> str:
    return escape_ncname("association-" + sha)


def generation_id(filename: str, sha: str) -> str:
    return escape_ncname("generation-" + base_entity_name(filename) + "-" + sha)


def invalidation_id(filename: str, sha: str) -> str:
    return escape_ncname("invalidation-" + base_entity_name(filename) + "-" + sha)


def usage_id(filename: str, sha: str, parent_sha: str) -> str:
    return escape_ncname(
        "usage-" + base_entity_name(filename) + "-" + sha + "-" + parent_sha
    )


def derivation_id(filename: str, sha: str, parent_sha: str) -> str:
    return escape_ncname(
        "derivation-" + specialized_entity_name(filename, sha) + "-" + parent_sha
    )


def derivation_cited_generation_id(sha: str) -> str:
    """Quirk 1: the derivation cites ``generation-{sha}`` (ProvenanceService.java:497)."""
    return escape_ncname("generation-" + sha)


def derivation_cited_usage_id(sha: str, parent_sha: str) -> str:
    """Quirk 1: the derivation cites ``usage-{sha}-{parentSha}`` (ProvenanceService.java:495)."""
    return escape_ncname("usage-" + sha + "-" + parent_sha)


def communication_id(parent_sha: str, sha: str) -> str:
    return escape_ncname("information-" + parent_sha + "-" + sha)


def graph_ns(graph: str) -> str:
    """Per-graph namespace URI — the generalized analog of the reference's
    ``https://<host>/repos/owner/{owner}/{name}#`` (ControllerUtils.java:10-12)."""
    return f"https://gitprov.example/graph/{graph}#"


def user_url(graph: str) -> str:
    """Generalized ``https://github.com/{owner}`` (ProvenanceService.java:284)."""
    return f"https://{graph}/"


def repo_url(graph: str) -> str:
    """Generalized ``{userUrl}/{repo}`` (ProvenanceService.java:285)."""
    return f"https://{graph}"


def commit_url(graph: str, sha: str) -> str:
    """Generalized ``{repoUrl}/commit/{sha}`` (ProvenanceService.java:303)."""
    return f"https://{graph}/snapshot/{sha}"
