#!/usr/bin/env python
"""One-shot converter: Horn lexicon data -> repo assets (Amharic/Oromo).

The reference distributes HornMorpho-derived public lexicon files under
``gradle/horn`` and builds its runtime lexicons with
``gradle/generateHornData.gradle.kts`` — this script ports that exact
transformation:

- per-language .lex files: "surface [lemma] ..." columns, '#' comments,
  bracketed tokens dropped, "''" lemma means identity; first-writer
  wins for identity entries, analyses overwrite
- generated inflection variants: each expandable entry also maps
  prefix+surface / surface+suffix / prefix+surface+combined-suffix to
  the same lemma (putIfAbsent)
- geez/am_conv_sera.txt: Ge'ez char -> SERA romanization pairs (a=b
  tokens, first writer wins)

Output (committed): lucene_kmp_ray/analysis/data/horn_lexicons.json.gz
"""

from __future__ import annotations

import gzip
import json
import os
import re
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/gradle/horn"
DST = os.path.join(os.path.dirname(__file__), "..",
                   "lucene_kmp_ray", "analysis", "data")

AMHARIC_FILES = [
    "am/lex/n_stem.lex", "am/lex/n_stemG.lex", "am/lex/n_stem_an.lex",
    "am/lex/n_analyzed.lex", "am/lex/n_analyzed_phon.lex",
    "am/lex/irr_plr.lex", "am/lex/irr_n.lex", "am/lex/irr_conj.lex",
    "am/lex/words.lex", "am/lex/words_phon.lex", "am/lex/n_name.lex",
    "am/lex/n_nameG.lex", "am/lex/n_place.lex", "am/lex/n_placeG.lex",
    "am/lex/prep_n.lex", "am/lex/ppron.lex", "am/lex/ppronG.lex",
    "am/lex/alle.lex", "am/lex/new.lex", "am/lex/vb_root.lex",
    "am/lex/vb_rootG.lex", "am/lex/v_analyzed.lex",
    "am/lex/v_analyzed_phon.lex", "am/lex/irr_stem.lex",
    "am/lex/irr_vnoun.lex",
]
OROMO_FILES = [
    "om/lex/nouns.lex", "om/lex/nouns0.lex", "om/lex/nouns_pl.lex",
    "om/lex/nouns_f.lex", "om/lex/nouns_m.lex", "om/lex/words.lex",
    "om/lex/v_stems.lex", "om/lex/v_stem.lex", "om/lex/irr_stem.lex",
    "om/lex/irr_stem+.lex", "om/lex/irr_stemG.lex",
]

AMHARIC_PREFIXES = ["ye", "le", "be", "ke", "s", "'nde"]
AMHARIC_SUFFIXES = ["oc", "ocn", "ocm", "ocnm", "acn", "acnm", "Woc",
                    "Wocn", "Wocm", "Wocnm", "N_a", "n_et", "m", "n", "s"]
AMHARIC_COMBINED = ["oc", "ocn", "Woc", "Wocn", "m", "n"]
OROMO_SUFFIXES = ["oota", "wwan", "leen", "tti", "irra", "iin", "aan",
                  "een", "ummaa", "n", "ni"]

_WS = re.compile(r"\s+")


def clean_token(value: str, lowercase: bool) -> str | None:
    t = value.strip()
    if not t or t.startswith("[") or t.startswith("{") or t == "''":
        return None
    t = t.strip(",;")
    if not t:
        return None
    return t.lower() if lowercase else t


def should_expand(tok: str) -> bool:
    return len(tok) >= 3 and not any(c in "[]{}" for c in tok)


def build_lexicon(files, lowercase, prefixes, suffixes, combined):
    entries: dict[str, str] = {}
    for rel in sorted(files, key=lambda p: os.path.basename(p)):
        path = os.path.join(SRC, rel)
        with open(path, encoding="utf-8") as f:
            for raw in f:
                line = raw.split("#")[0].strip()
                if not line:
                    continue
                cols = [c for c in _WS.split(line) if c]
                if not cols:
                    continue
                surface = clean_token(cols[0], lowercase)
                if surface is None:
                    continue
                lemma = None
                if len(cols) > 1:
                    lemma = clean_token(cols[1], lowercase)
                if lemma is None:
                    lemma = surface
                if lemma != surface:
                    entries[surface] = lemma
                else:
                    entries.setdefault(surface, lemma)
    base = list(entries.items())
    for surface, lemma in base:
        if not (should_expand(surface) and should_expand(lemma)):
            continue
        for suf in suffixes:
            entries.setdefault(surface + suf, lemma)
        for pre in prefixes:
            entries.setdefault(pre + surface, lemma)
            for suf in combined:
                entries.setdefault(pre + surface + suf, lemma)
    return entries


def build_geez_sera() -> dict[str, str]:
    out: dict[str, str] = {}
    with open(os.path.join(SRC, "geez/am_conv_sera.txt"),
              encoding="utf-8") as f:
        for raw in f:
            line = raw.split("#")[0].strip()
            if not line:
                continue
            for part in _WS.split(line):
                cols = part.split("=")
                if len(cols) >= 2 and cols[0] and cols[-1]:
                    out.setdefault(cols[0], cols[-1])
    # runtime uses only single-char Ge'ez keys [ref: HornLexicons
    # parseGeezSera: tab==1]
    return {k: v for k, v in out.items() if len(k) == 1}


def main() -> None:
    am = build_lexicon(AMHARIC_FILES, False, AMHARIC_PREFIXES,
                       AMHARIC_SUFFIXES, AMHARIC_COMBINED)
    om = build_lexicon(OROMO_FILES, True, [], OROMO_SUFFIXES, [])
    geez = build_geez_sera()
    blob = {"amharic": am, "oromo": om, "geez_sera": geez}
    path = os.path.join(DST, "horn_lexicons.json.gz")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        json.dump(blob, f, ensure_ascii=False, separators=(",", ":"))
    print(f"amharic={len(am)} oromo={len(om)} geez={len(geez)} "
          f"size={os.path.getsize(path)}")


if __name__ == "__main__":
    main()
