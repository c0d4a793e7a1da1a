"""Non-English Snowball stemming (stemmer_manager.h:8 language coverage).

The first-party de/fr/ru implementations (text/snowball.py) are checked
differentially against nltk's SnowballStemmer (independent implementation
of the same published algorithms) over generated word lists; the remaining
languages route through nltk directly.
"""

import numpy as np
import pytest

from typesense_tpu.text.snowball import french_stem, german_stem, russian_stem
from typesense_tpu.text.stemmer import Stemmer


DE_WORDS = """
abendlichen häuser kategorie aufgabe arbeiten möglichkeit schönheit
freundlichkeit verständnis wissenschaftler entwicklungen geschichten
bücher universität spielen gespielt spielte kinder kindern
regierungen wirtschaftlichen unternehmen verantwortung gesellschaft
deutschland deutschen sprache sprachen gesprochen verstehen verstanden
wunderbaren herrlichsten eigenschaften unglaublichen schwierigkeiten
""".split()

FR_WORDS = """
continuait continuelle majestueusement nationaux mangèrent rapidement
heureusement généralement développement gouvernement internationale
principalement particulièrement administration communication
populations traditionnelle révolutionnaire connaissances
établissement comprendre comprenait française françaises beauté
activités créativité possibilités universités
""".split()

RU_WORDS = """
вагона важная величайшими пользоваться государственного
правительства образования университета возможности деятельности
развития современных международной политических экономических
работающих говорить говорила написанный красивейший
""".split()


@pytest.mark.parametrize("ours,lang,words", [
    (german_stem, "german", DE_WORDS),
    (french_stem, "french", FR_WORDS),
    (russian_stem, "russian", RU_WORDS),
])
def test_differential_vs_nltk(ours, lang, words):
    nltk_snow = pytest.importorskip("nltk.stem.snowball")
    ref = nltk_snow.SnowballStemmer(lang)
    agree = sum(ours(w) == ref.stem(w) for w in words)
    frac = agree / len(words)
    diffs = [(w, ours(w), ref.stem(w)) for w in words if ours(w) != ref.stem(w)]
    assert frac >= 0.9, (lang, frac, diffs[:8])


def test_stemmer_routes_languages():
    assert Stemmer("de").stem("häuser") == "haus"
    assert Stemmer("fr").stem("nationaux") == "national"
    assert Stemmer("ru").stem("вагона") == "вагон"
    # nltk-backed languages
    assert Stemmer("es").stem("corriendo") in ("corr", "corriend")
    assert Stemmer("it").stem("bellissimo") != "bellissimo"
    # unknown language stays identity
    assert Stemmer("zz").stem("unchanged") == "unchanged"


def test_collection_stemming_de():
    """German docs stem at index AND query time (stem: true fields)."""
    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field

    coll = Collection("destem", [
        Field("title", "string", stem=True, locale="de"),
        Field("points", "int32")], default_sorting_field="points")
    coll.add({"id": "1", "title": "die schönen Häuser", "points": 1})
    coll.add({"id": "2", "title": "ein kleines Haus", "points": 2})
    res = coll.search({"q": "haus", "query_by": "title", "prefix": "false",
                       "num_typos": "0"})
    assert res["found"] == 2
    res = coll.search({"q": "häusern", "query_by": "title",
                       "prefix": "false", "num_typos": "0"})
    assert res["found"] >= 1
