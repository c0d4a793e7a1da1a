"""Stemming: Porter2 (English Snowball) algorithm + custom dictionaries.

Reference contract: /root/reference/include/stemmer_manager.h:8 (Snowball
libstemmer wrapper keyed by language, with optional user dictionaries that
take precedence — stemming/dictionaries routes import JSONL of
{"word": ..., "root": ...}). This is a from-scratch Porter2 implementation
(host-side text pipeline; the device only ever sees stemmed term ids)."""

from __future__ import annotations

import json
import threading

from typesense_tpu.core.errors import BadRequest, NotFound

_VOWELS = set("aeiouy")
_DOUBLES = {"bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"}
_LI_ENDING = set("cdeghkmnrt")


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """R1/R2 per Porter2 (position after first vowel-consonant pair)."""
    def region_after(start: int) -> int:
        for i in range(start, len(word) - 1):
            if _is_vowel(word, i) and not _is_vowel(word, i + 1):
                return i + 2
        return len(word)
    r1 = region_after(0)
    # exceptional prefixes
    for p in ("gener", "commun", "arsen"):
        if word.startswith(p):
            r1 = len(p)
            break
    r2 = region_after(r1)
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        return (not _is_vowel(word, n - 3) and _is_vowel(word, n - 2)
                and not _is_vowel(word, n - 1) and word[n - 1] not in "wxY")
    return False


def porter2_stem(word: str) -> str:  # noqa: C901 — algorithm is inherently branchy
    if len(word) <= 2:
        return word
    word = word.lower()
    exceptions = {
        "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
        "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
        "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
        "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
        "bias": "bias", "andes": "andes",
    }
    if word in exceptions:
        return exceptions[word]

    if word.startswith("'"):
        word = word[1:]
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)
    r1, r2 = _regions(word)

    # step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[:-len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s") and any(c in _VOWELS for c in word[:-2]):
        word = word[:-1]

    if word in ("inning", "outing", "canning", "herring", "earring",
                "proceed", "exceed", "succeed"):
        return word.lower().replace("Y", "y")

    # step 1b: eed/eedly -> ee when the suffix lies in R1
    step1b_done = False
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[:-len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[:-len(suf)]
                if any(c in _VOWELS for c in stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word[-2:] in _DOUBLES:
                        word = word[:-1]
                    elif _ends_short_syllable(word) and r1 >= len(word):
                        word += "e"
                break

    # step 1c
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # step 2 (suffix -> replacement, must be in R1)
    step2 = [("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
             ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
             ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
             ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
             ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
             ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
             ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
             ("bli", "ble"), ("ogi", "og"), ("li", "")]
    for suf, rep in step2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[:-len(suf)] + rep
            break

    # step 3
    r1, r2 = _regions(word)
    step3 = [("ational", "ate"), ("tional", "tion"), ("alize", "al"),
             ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
             ("ful", ""), ("ness", "")]
    for suf, rep in step3:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[:-len(suf)] + rep
            break
    else:
        if word.endswith("ative") and len(word) - 5 >= r2:
            word = word[:-5]

    # step 4
    r1, r2 = _regions(word)
    step4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
             "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic")
    for suf in step4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                word = word[:-len(suf)]
            break
    else:
        if word.endswith("ion") and len(word) - 3 >= r2 and \
                len(word) > 3 and word[-4] in "st":
            word = word[:-3]

    # step 5
    r1, r2 = _regions(word)
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (len(word) - 1 >= r1 and
                                   not _ends_short_syllable(word[:-1])):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


DICT_PREFIX = "$SD"


class Stemmer:
    """Per-language stemmer with optional dictionary overrides."""

    def __init__(self, language: str = "en", dictionary: dict | None = None):
        self.language = language
        self.dictionary = dictionary or {}

    def stem(self, word: str) -> str:
        hit = self.dictionary.get(word)
        if hit is not None:
            return hit
        if self.language in ("en", "english", ""):
            return porter2_stem(word)
        from typesense_tpu.text.snowball import STEMMERS
        fn = STEMMERS.get(self.language.lower())
        if fn is not None:
            return fn(word)
        nl = _nltk_stemmer(self.language.lower())
        if nl is not None:
            return nl.stem(word)
        return word  # unsupported languages: dictionary-only


_NLTK_LANGS = {
    "ar": "arabic", "da": "danish", "nl": "dutch", "fi": "finnish",
    "hu": "hungarian", "it": "italian", "no": "norwegian",
    "pt": "portuguese", "ro": "romanian", "es": "spanish", "sv": "swedish",
    "el": None, "arabic": "arabic", "danish": "danish", "dutch": "dutch",
    "finnish": "finnish", "hungarian": "hungarian", "italian": "italian",
    "norwegian": "norwegian", "portuguese": "portuguese",
    "romanian": "romanian", "spanish": "spanish", "swedish": "swedish",
}
_NLTK_CACHE: dict = {}


def _nltk_stemmer(lang: str):
    """Snowball stemmers for the remaining libstemmer languages
    (stemmer_manager.h:8) via the image's nltk (pure-algorithm, no corpus
    downloads). de/fr/ru use the first-party implementations in
    snowball.py; this covers es/it/pt/nl/sv/no/da/fi/hu/ro/ar."""
    name = _NLTK_LANGS.get(lang)
    if name is None:
        return None
    st = _NLTK_CACHE.get(name)
    if st is None:
        try:
            from nltk.stem.snowball import SnowballStemmer
            st = SnowballStemmer(name)
        except Exception:  # noqa: BLE001 — nltk unavailable/odd build
            st = False
        _NLTK_CACHE[name] = st
    return st or None


_ACTIVE: "StemmerManager | None" = None


def active_manager() -> "StemmerManager | None":
    return _ACTIVE


class StemmerManager:
    """stemmer_manager.h: stemmer registry + user dictionaries
    (stemming/dictionaries routes). The most recent instance is process-
    active so the tokenizer can resolve stem_dictionary references."""

    def __init__(self, store=None):
        global _ACTIVE
        _ACTIVE = self
        self.store = store
        self.dictionaries: dict[str, dict[str, str]] = {}
        self._lock = threading.Lock()

    def load(self):
        if self.store is None:
            return
        for k, v in self.store.scan(DICT_PREFIX + "_"):
            self.dictionaries[k[len(DICT_PREFIX) + 1:]] = json.loads(v)

    def import_dictionary(self, dict_id: str, jsonl: str) -> dict:
        words: dict[str, str] = dict(self.dictionaries.get(dict_id, {}))
        n = 0
        for line in jsonl.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                row = json.loads(line)
                words[row["word"]] = row["root"]
                n += 1
            except (json.JSONDecodeError, KeyError):
                raise BadRequest(f"Invalid dictionary line: `{line[:80]}`")
        with self._lock:
            self.dictionaries[dict_id] = words
            if self.store is not None:
                self.store.batch_write({f"{DICT_PREFIX}_{dict_id}":
                                        json.dumps(words)})
        return {"id": dict_id, "words": n}

    def get_dictionary(self, dict_id: str) -> dict:
        d = self.dictionaries.get(dict_id)
        if d is None:
            raise NotFound(f"Stemming dictionary `{dict_id}` not found.")
        return {"id": dict_id,
                "words": [{"word": w, "root": r} for w, r in d.items()]}

    def list_dictionaries(self) -> dict:
        return {"dictionaries": list(self.dictionaries)}

    def delete_dictionary(self, dict_id: str) -> dict:
        if dict_id not in self.dictionaries:
            raise NotFound(f"Stemming dictionary `{dict_id}` not found.")
        del self.dictionaries[dict_id]
        if self.store is not None:
            self.store.batch_write({}, deletes=[f"{DICT_PREFIX}_{dict_id}"])
        return {"id": dict_id}

    def get_stemmer(self, language: str = "en",
                    dictionary_name: str = "") -> Stemmer:
        return Stemmer(language, self.dictionaries.get(dictionary_name))
