"""Extract the reference's shipped Danish hyphenation pattern grammar.

The reference ships the FOP/TeX Danish hyphenation pattern file
(analysis/common/src/commonTest/resources/.../compound/da_UTF8.xml —
Apache-2.0 FOP data adapted from dkhyph.tex by Frank Jensen, public
linguistic data) as the fixture for HyphenationCompoundWordTokenFilter.
We commit it gzipped for analysis/compound.py.

Run once; the output is committed.
"""

from __future__ import annotations

import gzip
from pathlib import Path

SRC = Path("/root/reference/analysis/common/src/commonTest/resources/"
           "org/gnit/lucenekmp/analysis/compound/da_UTF8.xml")
OUT = Path(__file__).resolve().parent.parent / (
    "lucene_kmp_ray/analysis/data/hyph_da.xml.gz")


def main() -> None:
    OUT.write_bytes(gzip.compress(SRC.read_bytes()))
    print(f"{SRC.stat().st_size} bytes -> {OUT} ({OUT.stat().st_size})")


if __name__ == "__main__":
    main()
