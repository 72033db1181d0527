"""Assamese/Gujarati/Kannada/Malayalam/Marathi/Odia/Punjabi/Sinhala
conformance: vectors from the reference's Test*Analyzer.kt suites plus
generated-SQL parity fuzz over token-shaped inputs (tokens can only
carry SINGLE colons, the documented exactness domain of the one-pass
visarga regex)."""

import random

from lucene_kmp_ray.analysis import indic_extra as ie
from lucene_kmp_ray.analysis.arabic import fold_digits
from lucene_kmp_ray.analysis.indic import indic_normalize


def test_reference_vectors():
    cases = [
        (ie.AssameseAnalyzer, [("ঘৰলৈ", ["ঘৰ"]),
                               ("মানুহবোৰৰ", ["মানুহ"]),
                               ("কিতাপখনত", ["কিতাপ"]),
                               ("১২৩৪", ["1234"]),
                               ("এই আৰু ঘৰলৈ", ["ঘৰ"])]),
        (ie.GujaratiAnalyzer, [("ગુજરાતી", ["ગુજરાતી"]),
                               ("ગુજરાતીઓ", ["ગુજરાતી"]),
                               ("૧૨૩૪", ["1234"])]),
        (ie.KannadaAnalyzer, [("ಮನೆಗೆ", ["ಮನೆ"]),
                              ("ಪುಸ್ತಕಗಳನ್ನು", ["ಪುಸ್ತಕ"]),
                              ("ಕನ್ನಡದಲ್ಲಿ", ["ಕನ್ನಡ"]),
                              ("೧೨೩೪", ["1234"]),
                              ("ಈ ಮತ್ತು ಮನೆಗೆ", ["ಮನೆ"])]),
        (ie.MalayalamAnalyzer, [("പുസ്തകങ്ങൾ", ["പുസ്തക"]),
                                ("രാജ്യത്തിൽ", ["രാജ്യ"]),
                                ("൧൨൩൪", ["1234"]),
                                ("ഈ പുസ്തകങ്ങൾ ആണ്",
                                 ["പുസ്തക"])]),
        (ie.MarathiAnalyzer, [("पुस्तके", ["पुसतक"]),
                              ("मुली", ["मुल"]),
                              ("१२३४", ["1234"])]),
        (ie.OdiaAnalyzer, [("ଘରକୁ", ["ଘର"]),
                           ("ପିଲାମାନଙ୍କର", ["ପିଲା"]),
                           ("୧୨୩୪", ["1234"]),
                           ("ଏହି ଓ ଘରକୁ", ["ଘର"]),
                           ("ରାମ ଓ ସୀତା ଆମକୁ ଆଶୀର୍ବାଦ ଦେଇଛନ୍ତି",
                            ["ରାମ", "ସୀତା", "ଆମ", "ଆଶୀର୍ବାଦ"])]),
        (ie.PunjabiAnalyzer, [("ਭੱਜਣਾ", ["ਭੱਜ"]),
                              ("ਪੜਾਉਂਦਾ", ["ਪੜਾ"]),
                              ("੧੨੩੪", ["1234"]),
                              ("ਇਹ ਇੱਕ ਉਦਾਹਰਣ ਵਾਕ ਹੈ",
                               ["ਉਦਾਹਰਣ", "ਵਾਕ"])]),
        (ie.SinhalaAnalyzer, [("ගෙදරට", ["ගෙදර"]),
                              ("පොත්වලට", ["පොත්"]),
                              ("කතාවෙන්", ["කතා"]),
                              ("෦෧෨෩", ["0123"]),
                              ("මේ සහ ගෙදරට", ["ගෙදර"])]),
    ]
    for cls, vecs in cases:
        a = cls()
        for inp, exp in vecs:
            assert a(inp) == exp, (cls.__name__, inp)


def test_sql_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(81)
    con = duckdb.connect()
    alpha = {
        "gu": "કખગચછજઝટતદનપબમરલવશસહાિીુૂેૈોૌં:૧૨",
        "kn": "ಕಖಗಚಛಜಞಟತದನಪಬಮರಲವಶಸಹಾಿೀುೂೆೇೊೋಂ:್೧",
        "mr": "कखगघचछजझटठडढणतथदधनपफबभमयरलवशषसहािीुूेैोौंँ्ऩऱा१",
        "pa": "ਕਖਗਘਚਛਜਝਟਤਦਨਪਬਮਰਲਵਸਹਾਿੀੁੂੇੈੋੌਂਁ੍੧",
    }
    sfx_pool = {
        "gu": ie.GU_SUFFIXES, "kn": ie.KN_SUFFIXES,
        "mr": [s for _, ss, _ in ie.MR_TIERS for s in ss],
        "pa": [m for m, _, _ in ie.PA_RULES],
    }
    stems = {"gu": lambda w: ie._one_suffix_stem(w, ie.GU_SUFFIXES),
             "kn": lambda w: ie._one_suffix_stem(w, ie.KN_SUFFIXES),
             "mr": ie.marathi_stem, "pa": ie.punjabi_stem}
    for lang in alpha:
        words = set()
        for _ in range(500):
            base = "".join(random.choice(alpha[lang])
                           for _ in range(random.randint(0, 5)))
            w = base + random.choice(sfx_pool[lang] + [""])
            if "::" in w or w.startswith(":") or w.endswith(":"):
                continue
            words.add(w)
        words = sorted(w for w in words if w)
        digit = oracle._SQL_DIGIT_FOLD.format(col="traw")
        composed = oracle._indic_compose_sql(digit)
        norm = (oracle._mr_norm_sql(composed) if lang == "mr"
                else oracle._indic_extra_norm_sql(composed, lang))
        stem = oracle._indic_extra_stem_sql(lang)
        rows = con.execute(f"""
WITH raws AS (SELECT row_number() OVER () AS doc_id, traw
              FROM (SELECT unnest(?) AS traw)),
normed AS (SELECT doc_id, {norm} AS w FROM raws)
SELECT w, ({stem}) FROM normed ORDER BY doc_id
""", [words]).fetchall()
        for wraw, (nw, st) in zip(words, rows):
            pn = indic_normalize(fold_digits(wraw))
            pn = (ie.marathi_normalize(pn) if lang == "mr"
                  else ie._scan_normalize(pn, lang))
            assert nw == pn, (lang, wraw)
            assert st == stems[lang](pn), (lang, wraw)
