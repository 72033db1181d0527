"""Extract the reference's shipped Ukrainian stopword list.

The reference ships the full 1272-word Ukrainian stopword list as Kotlin
source (analysis/morfologik/.../uk/UkrainianStopwordsData.kt — public
linguistic data from the morfologik-ukrainian distribution); the
morfologik *dictionary* binary is absent from the distribution (only
gradle/morfologik/ukranian/ukrainian.info exists), so the analyzer pairs
this stop set with a curated lexicon (see analysis/ukrainian.py).

Run once; the output is committed.
"""

from __future__ import annotations

import gzip
import re
from pathlib import Path

SRC = Path("/root/reference/analysis/morfologik/src/commonMain/kotlin/"
           "org/gnit/lucenekmp/analysis/uk/UkrainianStopwordsData.kt")
OUT = Path(__file__).resolve().parent.parent / (
    "lucene_kmp_ray/analysis/data/ukrainian_stopwords.txt.gz")


def main() -> None:
    text = SRC.read_text()
    m = re.search(r'"""(.*?)"""', text, re.S)
    words = [w.strip() for w in m.group(1).splitlines() if w.strip()]
    OUT.write_bytes(gzip.compress(("\n".join(words) + "\n").encode()))
    print(f"{len(words)} stopwords -> {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
