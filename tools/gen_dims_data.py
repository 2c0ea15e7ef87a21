"""Regenerate cc_crawl_statistics_spark/dims_data.py from the reference's
vendored public data tables (IANA TLD registry snapshot, ISO continent
facts, MonthlyCrawl registry).

The data is public registry facts (iana.org / publicsuffix.org / ISO-3166);
the reference merely embeds a snapshot of it. We re-encode the same facts,
wrapped STRICTLY at token boundaries so whitespace-splitting can never
shear a token in half (the round-2 corruption: "xn-- " + "4dbrk0ce").

Run:  python tools/gen_dims_data.py          # rewrites dims_data.py in place
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "cc_crawl_statistics_spark" / "dims_data.py"


def load_reference_tables():
    sys.path.insert(0, str(REF))
    import top_level_domain as T  # noqa: E402  (reference, read-only)

    tld_types = dict(T.TopLevelDomain.tld_types)     # tld -> long type
    tld_ccs = dict(T.TopLevelDomain.tld_ccs)         # idn cc tld -> first-level cc
    short = T.TopLevelDomain.short_type

    # tld_by_continent imports matplotlib/fsspec which are absent here —
    # stub them so only the module-level data tables get built.
    for mod in ("fsspec", "matplotlib", "matplotlib.pyplot",
                "matplotlib.ticker", "pandas", "crawlplot", "crawlstats"):
        if mod not in sys.modules:
            m = types.ModuleType(mod)
            # attributes touched at import time
            m.MaxNLocator = object
            m.CrawlPlot = object
            m.MonthlyCrawl = object
            m.MultiCount = object
            m.pyplot = m
            m.ticker = m
            sys.modules[mod] = m
    sys.path.insert(0, str(REF / "plot"))
    import tld_by_continent as C  # noqa: E402

    return tld_types, tld_ccs, short, dict(C.tld_continent)


def wrap_tokens(tokens: list[str], indent: str = "        ", width: int = 76) -> str:
    """Emit tokens as adjacent string literals, each line a whole number of
    tokens followed by a trailing space — no token ever crosses a literal
    boundary."""
    lines, cur = [], ""
    for tok in tokens:
        piece = tok + " "
        if cur and len(indent) + 1 + len(cur) + len(piece) > width:
            lines.append(cur)
            cur = piece
        else:
            cur += piece
    if cur:
        lines.append(cur)
    return "\n".join(f'{indent}"{ln}"' for ln in lines)


def group_blob(groups: dict[str, list[str]]) -> str:
    out = []
    for name in sorted(groups):
        toks = sorted(set(groups[name]))
        out.append(f'    "{name}": (\n{wrap_tokens(toks)}\n    ),')
    return "\n".join(out)


def main():
    tld_types, tld_ccs, short, tld_continent = load_reference_tables()

    type_groups: dict[str, list[str]] = {}
    for tld, typ in tld_types.items():
        type_groups.setdefault(short(typ), []).append(tld)

    cont_groups: dict[str, list[str]] = {}
    for tld, cont in tld_continent.items():
        cont_groups.setdefault(cont, []).append(tld)

    # idn cc tld -> first-level ASCII cc (reference tld_ccs; 2x64 entries:
    # punycode + unicode form). Encoded as "idn>cc" tokens.
    cc_tokens = sorted(f"{k}>{v}" for k, v in tld_ccs.items())

    src = Path(__file__).resolve().parent / "dims_data.py.tmpl"
    template = src.read_text()
    body = (
        template
        .replace("@@TLD_TYPE_GROUPS@@", group_blob(type_groups))
        .replace("@@CONTINENT_GROUPS@@", group_blob(cont_groups))
        .replace("@@TLD_CC_FIRST_LEVEL@@", wrap_tokens(cc_tokens, indent="    "))
        .replace("@@N_TYPES@@", str(len(tld_types)))
        .replace("@@N_CONT@@", str(len(tld_continent)))
        .replace("@@N_CCS@@", str(len(tld_ccs)))
    )
    OUT.write_text(body)
    print(f"wrote {OUT}: {len(tld_types)} type rows, "
          f"{len(tld_continent)} continent rows, {len(tld_ccs)} idn-cc rows")


if __name__ == "__main__":
    main()
