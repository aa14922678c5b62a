"""Vendored Public Suffix List snapshot (r14, VERDICT r13 item 6).

The PSL (publicsuffix.org — public, CC0-listed data) is the registry
of suffixes under which internet names are registered by independent
parties: the *registered domain* of a host is one label more than its
longest matching public suffix.  r13's ``web.py`` approximated this
with "last two labels", which groups ``example.co.uk``-style hosts one
level too high — silently wrong for every per-domain policy decision
(``source_cap``-style caps, per-domain crawl rollups) on ccTLD hosts.

This module vendors a SNAPSHOT SUBSET of the list, chosen for crawl
coverage, not completeness:

* :data:`PSL_ICANN` — the classic second-level ccTLD registrations
  (``co.uk``, ``com.au``, ``co.jp``, …) across the registries that
  dominate real crawl traffic;
* :data:`PSL_PRIVATE` — a small set of high-traffic PRIVATE-section
  entries (``github.io``, ``blogspot.com``, …) where each subdomain is
  an independent publisher — exactly the granularity a per-domain
  training-data cap wants.

Since r15 (VERDICT r14 item 8) the two remaining PSL rule forms are
implemented as additional regex tiers:

* :data:`PSL_WILDCARD` — wildcard rules (``*.ck``): EVERY label
  directly under the base is itself a public suffix, so the
  registered domain is TWO labels plus the base
  (:func:`wildcard_regex`);
* :data:`PSL_EXCEPTIONS` — exception rules (``!www.ck``): the named
  domain is carved OUT of its wildcard, so it is itself the
  registered domain for any host at or under it
  (:func:`exception_regex`).

Rule precedence follows the PSL algorithm: exception beats wildcard
beats the explicit snapshot beats the last-two-labels fallback (the
rule sets are label-disjoint here, so this fixed tier order IS the
"most labels wins" rule).

Honest limits (documented, not hidden):

* the snapshot is PARTIAL — hosts under a suffix not listed here fall
  back to the last-two-labels rule (correct for every flat TLD:
  ``.com``, ``.org``, ``.de``, ``.nl``, …);
* a host that IS a bare public suffix (``co.uk``, ``shop.ck``) has no
  registered domain; all tiers miss and the fallback reports its last
  two labels — callers doing per-domain policy never see such hosts
  as crawl targets anyway (hosts like ``www.co.uk`` are NOT in this
  class: since r16 the ``www.``-strip checks the remainder against
  :func:`bare_suffix_regex` and keeps the ``www`` as the registrable
  label — ADVICE r15);
* the United States locality scheme is covered for its REGULAR tier
  (r15: ``k12/cc/lib.<state>.us`` for all 50 states + DC, generated
  into :data:`PSL_US_LOCALITY` — the category registrations school
  crawls actually hit); the city-name tier (``<city>.<state>.us``)
  remains omitted: city labels are an open set the PSL itself only
  samples.

Each suffix test renders as ONE backslash-free regular expression
(:func:`domain_regex`, :func:`wildcard_regex`, :func:`exception_regex`)
so it runs identically as a Spark SQL fragment (Java regex) and inside
the DuckDB oracle (RE2) — the portable-fragment discipline of
:mod:`.web`.
"""

from __future__ import annotations

#: ICANN-section second-level registrations (snapshot subset).
PSL_ICANN: tuple[str, ...] = (
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "sch.uk",
    # Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # New Zealand
    "ac.nz", "co.nz", "govt.nz", "net.nz", "org.nz", "school.nz",
    # Brazil
    "com.br", "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    # India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "mil.za", "net.za", "org.za",
    "web.za",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # South Korea
    "ac.kr", "co.kr", "go.kr", "mil.kr", "ne.kr", "or.kr", "pe.kr",
    "re.kr",
    # Taiwan
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "mil.tw", "net.tw", "org.tw",
    # Hong Kong
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    # Singapore
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # Mexico
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    # Argentina
    "com.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "net.ar", "org.ar",
    # Turkey
    "av.tr", "com.tr", "edu.tr", "gov.tr", "mil.tr", "net.tr", "org.tr",
    # Poland
    "com.pl", "edu.pl", "gov.pl", "mil.pl", "net.pl", "org.pl",
    # Israel
    "ac.il", "co.il", "gov.il", "k12.il", "muni.il", "net.il", "org.il",
    # Indonesia
    "ac.id", "biz.id", "co.id", "go.id", "mil.id", "my.id", "net.id",
    "or.id", "sch.id", "web.id",
    # Thailand
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    # Malaysia
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    # Philippines
    "com.ph", "edu.ph", "gov.ph", "mil.ph", "net.ph", "ngo.ph", "org.ph",
    # Vietnam
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "int.vn", "net.vn",
    "org.vn", "pro.vn",
    # Ukraine
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    # Egypt
    "com.eg", "edu.eg", "gov.eg", "mil.eg", "net.eg", "org.eg", "sci.eg",
    # Saudi Arabia
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "sch.sa",
    # Kenya
    "ac.ke", "co.ke", "go.ke", "ne.ke", "or.ke", "sc.ke",
    # Nigeria
    "com.ng", "edu.ng", "gov.ng", "mil.ng", "net.ng", "org.ng", "sch.ng",
    # Spain
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    # Portugal
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "org.pt",
    # Greece
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    # France (registry second-levels)
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "tm.fr",
    # Colombia
    "com.co", "edu.co", "gov.co", "net.co", "nom.co", "org.co",
    # Venezuela
    "co.ve", "com.ve", "edu.ve", "gob.ve", "net.ve", "org.ve",
    # Peru
    "com.pe", "edu.pe", "gob.pe", "net.pe", "org.pe",
    # Ecuador
    "com.ec", "edu.ec", "gob.ec", "net.ec", "org.ec",
    # Pakistan
    "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk",
    # Bangladesh is a WILDCARD registry in the real PSL (*.bd) — see
    # PSL_WILDCARD; the r14 snapshot's explicit bd entries were an
    # approximation and are superseded by the wildcard tier
    # Sri Lanka
    "ac.lk", "com.lk", "edu.lk", "gov.lk", "net.lk", "org.lk",
    # Nepal
    "com.np", "edu.np", "gov.np", "net.np", "org.np",
    # Russia second-levels kept by the registry
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru",
    # Italy registry second-levels
    "edu.it", "gov.it",
    # Romania
    "com.ro", "nom.ro", "org.ro",
    # Hungary
    "co.hu", "info.hu", "org.hu",
    # Ireland / Iceland-style co. registries
    "gov.ie",
    # Chile
    "gob.cl", "gov.cl",
    # Uruguay
    "com.uy", "edu.uy", "gub.uy", "net.uy", "org.uy",
    # Bolivia
    "com.bo", "edu.bo", "gob.bo", "net.bo", "org.bo",
    # Paraguay
    "com.py", "edu.py", "gov.py", "net.py", "org.py",
)

#: PRIVATE-section entries (snapshot subset): multi-tenant platforms
#: where each subdomain is an independent publisher.
PSL_PRIVATE: tuple[str, ...] = (
    "appspot.com",
    "azurewebsites.net",
    "blogspot.com",
    "firebaseapp.com",
    "github.io",
    "gitlab.io",
    "herokuapp.com",
    "netlify.app",
    "pages.dev",
    "vercel.app",
    "web.app",
    "workers.dev",
)

#: United States locality scheme, regular tier (r15): the per-state
#: category registrations — k12 (schools), cc (community colleges),
#: lib (libraries) — under every state code + DC. Generated, not
#: hand-listed: the PSL spells these out per state and the set is
#: exactly this product.
_US_STATES = ("ak al ar az ca co ct dc de fl ga hi ia id il in ks ky "
              "la ma md me mi mn mo ms mt nc nd ne nh nj nm nv ny oh "
              "ok or pa ri sc sd tn tx ut va vt wa wi wv wy").split()

PSL_US_LOCALITY: tuple[str, ...] = tuple(
    f"{cat}.{st}.us" for st in _US_STATES for cat in ("cc", "k12", "lib"))

#: The full snapshot, longest-first (labels desc, then lexicographic):
#: with every alternative anchored at end-of-host, label-count-desc
#: ordering makes leftmost-first regex engines (Java) and RE2 agree on
#: the longest matching suffix.
PSL_SNAPSHOT: tuple[str, ...] = tuple(
    sorted(set(PSL_ICANN) | set(PSL_PRIVATE) | set(PSL_US_LOCALITY),
           key=lambda s: (-s.count("."), s)))


#: Wildcard rule bases (the ``*.<base>`` form): every label directly
#: under the base is a public suffix. Snapshot: the all-wildcard
#: ccTLD registries that dominate real crawl traffic plus one
#: Japanese geographic base to pin the multi-label case.
PSL_WILDCARD: tuple[str, ...] = (
    "bd", "ck", "er", "fk", "kh", "mm", "pg", "kawasaki.jp",
)

#: Exception rules (the ``!<domain>`` form): carved out of their
#: wildcard — the named domain is NOT a public suffix, it IS the
#: registered domain for any host at or under it.
PSL_EXCEPTIONS: tuple[str, ...] = (
    "www.ck", "city.kawasaki.jp",
)


def domain_regex() -> str:
    """One backslash-free regex capturing the registered domain of a
    (lowercased) host whose suffix is in the snapshot: group 1 is one
    label plus the longest matching suffix. No match (flat TLD, bare
    suffix, unknown registry) returns '' in BOTH Spark and DuckDB —
    the caller falls through to the next tier."""
    alts = "|".join(s.replace(".", "[.]") for s in PSL_SNAPSHOT)
    return f"([^.]+[.](?:{alts}))$"


def wildcard_regex() -> str:
    """Registered domain under a wildcard rule: for ``*.ck`` the
    public suffix is ``<any label>.ck``, so group 1 is TWO labels plus
    the base. Bases sorted labels-desc then lexicographic (the
    :data:`PSL_SNAPSHOT` longest-first discipline)."""
    bases = sorted(PSL_WILDCARD, key=lambda s: (-s.count("."), s))
    alts = "|".join(s.replace(".", "[.]") for s in bases)
    return f"([^.]+[.][^.]+[.](?:{alts}))$"


def exception_regex() -> str:
    """Registered domain under an exception rule: the exception
    domain itself, whether the host equals it or sits below it —
    ``(?:^|[.])`` pins the label boundary without a backslash."""
    excs = sorted(PSL_EXCEPTIONS, key=lambda s: (-s.count("."), s))
    alts = "|".join(s.replace(".", "[.]") for s in excs)
    return f"(?:^|[.])({alts})$"


def bare_suffix_regex() -> str:
    """Full-string test: does a (lowercased) host string consist of
    NOTHING BUT a public suffix — explicit snapshot entry, or one
    label over a wildcard base (``anything.ck``)? Used by the
    ``www.``-strip guard in :mod:`.web` (ADVICE r15): for hosts like
    ``www.co.uk`` or ``www.shop.ck`` the remainder after stripping is
    a bare suffix, which per the PSL algorithm means ``www`` is the
    REGISTRABLE label and must stay. Anchored ``^…$`` — unlike the
    domain tiers this is an exact-match test, not a suffix search.
    Exception domains (``!www.ck``) are carved back out by the caller
    via :func:`exception_exact_regex` (RE2 has no lookahead, so the
    exclusion cannot live inside this expression)."""
    alts = "|".join(s.replace(".", "[.]") for s in PSL_SNAPSHOT)
    bases = sorted(PSL_WILDCARD, key=lambda s: (-s.count("."), s))
    walts = "|".join(s.replace(".", "[.]") for s in bases)
    return f"^((?:{alts})|[^.]+[.](?:{walts}))$"


def exception_exact_regex() -> str:
    """Full-string test: is the host string EXACTLY an exception
    domain (``www.ck``)? The companion to :func:`bare_suffix_regex` —
    an exception domain also matches the wildcard arm of the bare-
    suffix test, but it is a registrable domain, not a suffix."""
    excs = sorted(PSL_EXCEPTIONS, key=lambda s: (-s.count("."), s))
    alts = "|".join(s.replace(".", "[.]") for s in excs)
    return f"^({alts})$"
