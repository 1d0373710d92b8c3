"""RFC 3986 URL normalization — the crawl-identity canonicalizer.

Every large crawl needs ONE canonical spelling per url before any
url-keyed stage (snapshot compaction, link-graph build, frontier dedup):
`HTTPS://Host:443/a/../b` and `https://host/b` are the same resource,
and leaving both alive double-counts pages and splits link mass.

Implements syntax-based normalization per RFC 3986 §6.2.2 (public
spec; no external libs — stdlib only):

  * case normalization        — scheme + host lowercased (§6.2.2.1)
  * percent-encoding          — escapes uppercased; UNRESERVED octets
    (ALPHA / DIGIT / - . _ ~) decoded, in path and query (§6.2.2.2)
  * dot segments removed      — the §5.2.4 algorithm, verbatim
  * default ports dropped     — :80 http / :443 https (§6.2.3)
  * empty path → '/'          — scheme-based normalization (§6.2.3)
  * fragment dropped          — crawl identity, not RFC: the fragment
    never reaches the server (§3.5), so two urls differing only in
    fragment are one fetch. ``keep_fragment=True`` opts out.
  * empty query dropped       — ``/a?`` → ``/a``: stdlib urlsplit
    cannot represent "present but empty", and for crawl identity the
    two spellings are one fetch anyway (documented deviation).

The plain-Python spec (`normalize_url_py`) is the unit-testable form;
the Spark operator wraps it in an Arrow-batched pandas_udf (string in,
string out, zero shuffle) — the same split every web op here uses
(htmltext.py, warc.py).
"""

from __future__ import annotations

from urllib.parse import urlsplit

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = frozenset("0123456789abcdefABCDEF")
_DEFAULT_PORT = {"http": 80, "https": 443}


def _norm_escapes(s: str) -> str:
    """§6.2.2.2: uppercase %XX escapes; decode the unreserved ones.
    Malformed escapes (%, %Z9, trailing %A) pass through verbatim —
    normalization must never corrupt what it doesn't understand."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 3 <= n:
            h = s[i + 1 : i + 3]
            if h[0] in _HEX and h[1] in _HEX:
                ch = chr(int(h, 16))
                if ch in _UNRESERVED:
                    out.append(ch)
                else:
                    out.append("%" + h.upper())
                i += 3
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4, the buffer algorithm verbatim."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1) if inp.startswith("/") else inp.find("/")
            if i == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def normalize_url_py(url: str, keep_fragment: bool = False) -> str:
    """Canonical spelling of `url` per the module contract. Relative
    references and non-http(s) schemes are returned with the generic
    normalizations only (no port/path defaulting assumptions)."""
    if url is None:
        return None
    try:
        sp = urlsplit(url)
    except ValueError:
        return url  # unparseable: leave the spelling alone
    scheme = sp.scheme.lower()
    # netloc: lowercase host, keep userinfo verbatim, drop default port
    host = (sp.hostname or "").lower()
    try:
        port = sp.port
    except ValueError:
        port = None  # non-numeric port: keep netloc as-is below
        host = None
    if host is None:
        netloc = sp.netloc
    else:
        userinfo = ""
        if "@" in sp.netloc:
            userinfo = sp.netloc.rsplit("@", 1)[0] + "@"
        netloc = userinfo + host
        if port is not None and port != _DEFAULT_PORT.get(scheme):
            netloc += f":{port}"
    path = _remove_dot_segments(_norm_escapes(sp.path))
    if netloc and not path:
        path = "/"  # §6.2.3: empty path equivalent to '/'
    query = _norm_escapes(sp.query)
    out = ""
    if scheme:
        out += scheme + ":"
    if netloc or scheme in _DEFAULT_PORT:
        out += "//" + netloc
    out += path
    if query:
        out += "?" + query
    if keep_fragment and sp.fragment:
        out += "#" + sp.fragment
    return out
