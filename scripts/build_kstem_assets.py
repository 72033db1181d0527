"""Decode the reference's shipped KStem dictionary into a flat asset.

The reference ships the full Krovetz-stemmer lexicon as Kotlin source
(analysis/common/.../en/KStemData1.kt .. KStemData8.kt — "created from
head_word_list.txt") plus five semantic tables inside KStemmer.kt
(exceptionWords, supplementDict, properNouns, directConflations,
countryNationality).  This script extracts the raw word data — public
linguistic data from the original Apache Lucene distribution — into
lucene_kmp_ray/analysis/data/kstem.txt.gz with three record kinds:

    E word          exception entry   (DictEntry(word, exception=true))
    C word root     direct conflation (DictEntry(root, exception=false))
    D word          plain head word   (DictEntry(null,  exception=false))

Run once; the output is committed. ref: KStemmer.kt:1310-1432
(initializeDictHash) for the table -> entry mapping.
"""

from __future__ import annotations

import gzip
import re
from pathlib import Path

REF_EN = Path("/root/reference/analysis/common/src/commonMain/kotlin/"
              "org/gnit/lucenekmp/analysis/en")
OUT = Path(__file__).resolve().parent.parent / (
    "lucene_kmp_ray/analysis/data/kstem.txt.gz")

STR = re.compile(r'"([^"]*)"')


def block(src: str, name: str) -> str:
    """Source text of `val <name> ... = arrayOf( ... )` up to the matching
    close paren (tables contain no nested parens beyond arrayOf pairs).
    Line comments are stripped first — one holds an unbalanced ')'."""
    src = re.sub(r"//[^\n]*", "", src)
    start = src.index(f"val {name}")
    depth = 0
    i = src.index("arrayOf", start)
    for j in range(i, len(src)):
        if src[j] == "(":
            depth += 1
        elif src[j] == ")":
            depth -= 1
            if depth == 0:
                return src[i:j]
    raise ValueError(name)


def main() -> None:
    stemmer_src = (REF_EN / "KStemmer.kt").read_text()

    exceptions = STR.findall(block(stemmer_src, "exceptionWords"))
    supplement = STR.findall(block(stemmer_src, "supplementDict"))
    proper = STR.findall(block(stemmer_src, "properNouns"))

    def pairs(name: str) -> list[tuple[str, str]]:
        words = STR.findall(block(stemmer_src, name))
        assert len(words) % 2 == 0
        return list(zip(words[0::2], words[1::2]))

    conflations = pairs("directConflations")
    nationalities = pairs("countryNationality")

    head_words: list[str] = []
    for i in range(1, 9):
        head_words.extend(STR.findall(
            block((REF_EN / f"KStemData{i}.kt").read_text(), "data")))

    lines: list[str] = []
    seen: set[str] = set()

    def add(kind: str, word: str, root: str = "") -> None:
        # initializeDictHash throws on duplicates; first-wins keeps the
        # same table precedence (exceptions, conflations, data, ...)
        if word in seen:
            return
        seen.add(word)
        lines.append(f"{kind} {word} {root}".rstrip())

    for w in exceptions:
        add("E", w)
    for w, r in conflations + nationalities:
        add("C", w, r)
    for w in head_words + supplement + proper:
        add("D", w)

    OUT.write_bytes(gzip.compress(("\n".join(lines) + "\n").encode()))
    print(f"{len(lines)} entries -> {OUT} "
          f"({OUT.stat().st_size} bytes; {len(exceptions)} E, "
          f"{len(conflations) + len(nationalities)} C)")


if __name__ == "__main__":
    main()
