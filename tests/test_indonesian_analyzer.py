"""Indonesian analyzer conformance — TestIndonesianStemmer.kt vectors
(derivational + inflectional-only modes) and chain checks."""

import pytest

from lucene_kmp_ray.analysis.indonesian import (IndonesianAnalyzer,
                                                indonesian_stem)

DERIVATIONAL_VECTORS = [
    ("bukukah", "buku"), ("adalah", "ada"), ("bukupun", "buku"),
    ("bukuku", "buku"), ("bukumu", "buku"), ("bukunya", "buku"),
    ("mengukur", "ukur"), ("menyapu", "sapu"), ("menduga", "duga"),
    ("menuduh", "uduh"), ("membaca", "baca"), ("merusak", "rusak"),
    ("pengukur", "ukur"), ("penyapu", "sapu"), ("penduga", "duga"),
    ("pembaca", "baca"), ("diukur", "ukur"), ("tersapu", "sapu"),
    ("kekasih", "kasih"), ("berlari", "lari"), ("belajar", "ajar"),
    ("bekerja", "kerja"), ("perjelas", "jelas"), ("pelajar", "ajar"),
    ("pekerja", "kerja"), ("tarikkan", "tarik"), ("ambilkan", "ambil"),
    ("mengambilkan", "ambil"), ("makanan", "makan"),
    ("janjian", "janji"), ("perjanjian", "janji"), ("tandai", "tanda"),
    ("dapati", "dapat"), ("mendapati", "dapat"), ("pantai", "panta"),
    ("penyalahgunaan", "salahguna"), ("menyalahgunakan", "salahguna"),
    ("disalahgunakan", "salahguna"),
    ("pertanggungjawaban", "tanggungjawab"),
    ("mempertanggungjawabkan", "tanggungjawab"),
    ("dipertanggungjawabkan", "tanggungjawab"),
    ("pelaksanaan", "laksana"), ("pelaksana", "laksana"),
    ("melaksanakan", "laksana"), ("dilaksanakan", "laksana"),
    ("melibatkan", "libat"), ("terlibat", "libat"),
    ("penculikan", "culik"), ("menculik", "culik"),
    ("diculik", "culik"), ("penculik", "culik"),
    ("perubahan", "ubah"), ("peledakan", "ledak"),
    ("penanganan", "tangan"), ("kepolisian", "polisi"),
    ("kenaikan", "naik"), ("bersenjata", "senjata"),
    ("penyelewengan", "seleweng"), ("kecelakaan", "celaka"),
    ("gigi", "gigi"),
]

INFLECTIONAL_VECTORS = [
    ("bukunya", "buku"), ("bukukah", "buku"), ("bukunyakah", "buku"),
    ("dibukukannya", "dibukukan"),
]


@pytest.mark.parametrize("word,stem", DERIVATIONAL_VECTORS)
def test_derivational(word, stem):
    assert indonesian_stem(word) == stem


@pytest.mark.parametrize("word,stem", INFLECTIONAL_VECTORS)
def test_inflectional_only(word, stem):
    assert indonesian_stem(word, derivational=False) == stem


def test_chain_and_stops():
    a = IndonesianAnalyzer()
    assert a("yang mengukur bukunya") == ["ukur", "buku"]


def test_analyze_flat_agrees_with_call():
    a = IndonesianAnalyzer()
    texts = ["yang mengukur bukunya", "penyalahgunaan dilaksanakan",
             "belajar dan bekerja"]
    lengths, flat, doc_of, _pos = a.analyze_flat(texts)
    toks = flat.to_pylist()
    per_doc = [[] for _ in texts]
    for t, d in zip(toks, doc_of):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
    assert list(lengths) == [len(x) for x in per_doc]
