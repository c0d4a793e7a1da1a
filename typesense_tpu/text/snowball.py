"""Snowball stemmers for German, French and Russian, implemented from the
published Snowball algorithm descriptions (snowballstem.org) — the same
algorithms the reference links through libstemmer
(/root/reference/include/stemmer_manager.h:8). Host-side text pipeline;
the device only sees stemmed term ids.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------

_DE_VOWELS = set("aeiouyäöü")
_DE_S_END = set("bdfghklmnrt")
_DE_ST_END = set("bdfghklmnt")


def _de_r12(word: str) -> tuple[int, int]:
    def region_after(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _DE_VOWELS and word[i + 1] not in _DE_VOWELS:
                return i + 2
        return len(word)
    r1 = region_after(0)
    r1 = max(r1, 3)            # region before R1 has at least 3 letters
    r2 = region_after(r1 - 1 if r1 <= len(word) else 0)
    # R2 must be computed from the ORIGINAL definition (after adjustment
    # of R1 only the start moves); recompute properly:
    r2 = region_after(_de_r1_raw(word))
    return r1, r2


def _de_r1_raw(word: str) -> int:
    for i in range(len(word) - 1):
        if word[i] in _DE_VOWELS and word[i + 1] not in _DE_VOWELS:
            return i + 2
    return len(word)


def german_stem(word: str) -> str:
    word = word.lower().replace("ß", "ss")
    # mark u/y between vowels as consonants
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS and \
                chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)
    r1, r2 = _de_r12(word)

    def in_r1(pos):
        return pos >= r1

    def in_r2(pos):
        return pos >= r2

    # step 1
    for suf in ("ern", "em", "er"):
        if word.endswith(suf):
            if in_r1(len(word) - len(suf)):
                word = word[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if word.endswith(suf):
                if in_r1(len(word) - len(suf)):
                    word = word[: -len(suf)]
                    if word.endswith("niss"):
                        word = word[:-1]
                break
        else:
            if word.endswith("s") and len(word) >= 2 and \
                    word[-2] in _DE_S_END and in_r1(len(word) - 1):
                word = word[:-1]

    # step 2
    for suf in ("est", "en", "er"):
        if word.endswith(suf):
            if in_r1(len(word) - len(suf)):
                word = word[: -len(suf)]
            break
    else:
        if word.endswith("st") and len(word) >= 6 and \
                word[-3] in _DE_ST_END and in_r1(len(word) - 2):
            word = word[:-2]

    # step 3: d-suffixes
    if word.endswith(("end", "ung")):
        if in_r2(len(word) - 3):
            word = word[:-3]
            if word.endswith("ig") and in_r2(len(word) - 2) and \
                    (len(word) < 3 or word[-3] != "e"):
                word = word[:-2]
    elif word.endswith(("isch",)):
        if in_r2(len(word) - 4) and (len(word) < 5 or word[-5] != "e"):
            word = word[:-4]
    elif word.endswith(("ig", "ik")):
        if in_r2(len(word) - 2) and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]
    elif word.endswith(("lich", "heit")):
        if in_r2(len(word) - 4):
            word = word[:-4]
            for pre in ("er", "en"):
                if word.endswith(pre) and in_r1(len(word) - 2):
                    word = word[:-2]
                    break
    elif word.endswith("keit"):
        if in_r2(len(word) - 4):
            word = word[:-4]
            if word.endswith("lich") and in_r2(len(word) - 4):
                word = word[:-4]
            elif word.endswith("ig") and in_r2(len(word) - 2):
                word = word[:-2]

    word = word.lower()
    return (word.replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_VOWELS = set("aeiouyâàëéêèïîôûù")


def _fr_mark(word: str) -> str:
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1].lower() in _FR_VOWELS
        next_v = i + 1 < n and chars[i + 1].lower() in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _fr_rv(word: str) -> int:
    lw = word.lower()
    n = len(lw)
    if n >= 3 and lw[0] in _FR_VOWELS and lw[1] in _FR_VOWELS:
        return 3
    if lw[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, n):
        if lw[i] in _FR_VOWELS:
            return i + 1
    return n


def _fr_r12(word: str) -> tuple[int, int]:
    lw = word.lower()

    def region_after(start: int) -> int:
        for i in range(start, len(lw) - 1):
            if lw[i] in _FR_VOWELS and lw[i + 1] not in _FR_VOWELS:
                return i + 2
        return len(lw)
    r1 = region_after(0)
    r2 = region_after(r1)
    return r1, r2


def french_stem(word: str) -> str:   # noqa: C901 — spec is inherently branchy
    word = _fr_mark(word.lower())
    rv, (r1, r2) = _fr_rv(word), _fr_r12(word)
    orig = word

    def pos_ok(pos, region):
        return pos >= region

    def ends(w, *sufs):
        for s in sorted(sufs, key=len, reverse=True):
            if w.endswith(s):
                return s
        return None

    step1_done = False
    s = ends(word, "ance", "iqUe", "isme", "able", "iste", "eux",
             "ances", "iqUes", "ismes", "ables", "istes")
    s2 = ends(word, "atrice", "ateur", "ation", "atrices", "ateurs",
              "ations")
    s3 = ends(word, "logie", "logies")
    s4 = ends(word, "usion", "ution", "usions", "utions")
    s5 = ends(word, "ence", "ences")
    s6 = ends(word, "ement", "ements")
    s7 = ends(word, "ité", "ités")
    s8 = ends(word, "if", "ive", "ifs", "ives")
    s9 = ends(word, "eaux")
    s10 = ends(word, "aux")
    s11 = ends(word, "euse", "euses")
    s12 = ends(word, "issement", "issements")
    s13 = ends(word, "amment")
    s14 = ends(word, "emment")
    s15 = ends(word, "ment", "ments")
    # longest-match dispatch
    cands = [x for x in (s, s2, s3, s4, s5, s6, s7, s8, s9, s10, s11, s12,
                         s13, s14, s15) if x]
    best = max(cands, key=len) if cands else None
    if best is not None:
        p = len(word) - len(best)
        if best in ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
                    "iqUes", "ismes", "ables", "istes"):
            if pos_ok(p, r2):
                word = word[:p]
                step1_done = True
        elif best in ("atrice", "ateur", "ation", "atrices", "ateurs",
                      "ations"):
            if pos_ok(p, r2):
                word = word[:p]
                step1_done = True
                if word.endswith("ic"):
                    if pos_ok(len(word) - 2, r2):
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif best in ("logie", "logies"):
            if pos_ok(p, r2):
                word = word[:p] + "log"
                step1_done = True
        elif best in ("usion", "ution", "usions", "utions"):
            if pos_ok(p, r2):
                word = word[:p] + "u"
                step1_done = True
        elif best in ("ence", "ences"):
            if pos_ok(p, r2):
                word = word[:p] + "ent"
                step1_done = True
        elif best in ("ement", "ements"):
            if pos_ok(p, rv):
                word = word[:p]
                step1_done = True
                if word.endswith("iv") and pos_ok(len(word) - 2, r2):
                    word = word[:-2]
                    if word.endswith("at") and pos_ok(len(word) - 2, r2):
                        word = word[:-2]
                elif word.endswith("eus"):
                    if pos_ok(len(word) - 3, r2):
                        word = word[:-3]
                    elif pos_ok(len(word) - 3, r1):
                        word = word[:-3] + "eux"
                elif word.endswith(("abl", "iqU")) and \
                        pos_ok(len(word) - 3, r2):
                    word = word[:-3]
                elif word.endswith(("ièr", "Ièr")) and \
                        pos_ok(len(word) - 3, rv):
                    word = word[:-3] + "i"
        elif best in ("ité", "ités"):
            if pos_ok(p, r2):
                word = word[:p]
                step1_done = True
                if word.endswith("abil"):
                    if pos_ok(len(word) - 4, r2):
                        word = word[:-4]
                    else:
                        word = word[:-4] + "abl"
                elif word.endswith("ic"):
                    if pos_ok(len(word) - 2, r2):
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word.endswith("iv") and pos_ok(len(word) - 2, r2):
                    word = word[:-2]
        elif best in ("if", "ive", "ifs", "ives"):
            if pos_ok(p, r2):
                word = word[:p]
                step1_done = True
                if word.endswith("at") and pos_ok(len(word) - 2, r2):
                    word = word[:-2]
                    if word.endswith("ic"):
                        if pos_ok(len(word) - 2, r2):
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
        elif best == "eaux":
            word = word[:p] + "eau"
            step1_done = True
        elif best == "aux":
            if pos_ok(p, r1):
                word = word[:p] + "al"
                step1_done = True
        elif best in ("euse", "euses"):
            if pos_ok(p, r2):
                word = word[:p]
                step1_done = True
            elif pos_ok(p, r1):
                word = word[:p] + "eux"
                step1_done = True
        elif best in ("issement", "issements"):
            if pos_ok(p, r1) and p > 0 and \
                    word[p - 1].lower() not in _FR_VOWELS:
                word = word[:p]
                step1_done = True
        elif best == "amment":
            if pos_ok(p, rv):
                word = word[:p] + "ant"
        elif best == "emment":
            if pos_ok(p, rv):
                word = word[:p] + "ent"
        elif best in ("ment", "ments"):
            if p > 0 and pos_ok(p - 1, rv) and \
                    word[p - 1].lower() in _FR_VOWELS:
                word = word[:p]

    do_2a = (word == orig) or best in ("amment", "emment", "ment", "ments")
    altered = word != orig
    if do_2a:
        pre = word
        sufs_2a = ("issaIent", "issantes", "issions", "issants", "issante",
                   "issants", "issait", "issais", "issant", "issiez",
                   "issons", "issent", "isses", "issez", "isse", "irions",
                   "iraIent", "irait", "irais", "irai", "iras", "irent",
                   "irez", "iriez", "irons", "iront", "îtes", "îmes", "ira",
                   "ies", "ît", "ie", "ir", "is", "it", "i")
        for suf in sorted(set(sufs_2a), key=len, reverse=True):
            if word.endswith(suf):
                p = len(word) - len(suf)
                if pos_ok(p, rv) and p > 0 and \
                        word[p - 1].lower() not in _FR_VOWELS and \
                        p - 1 >= rv:
                    word = word[:p]
                break
        if word == pre:
            # step 2b
            s_ions = word.endswith("ions")
            sufs_er = ("eraIent", "erions", "èrent", "erais", "erait",
                       "eriez", "erons", "eront", "erai", "eras", "erez",
                       "ées", "era", "iez", "ée", "és", "er", "ez", "é")
            sufs_a = ("assions", "assiez", "assent", "asses", "antes",
                      "aIent", "asse", "ants", "ante", "âmes", "âtes",
                      "ais", "ait", "ant", "ât", "ai", "as", "a")
            matched = None
            for suf in sorted(set(("ions",) + sufs_er + sufs_a),
                              key=len, reverse=True):
                if word.endswith(suf):
                    matched = suf
                    break
            if matched == "ions" and s_ions:
                if pos_ok(len(word) - 4, r2) and pos_ok(len(word) - 4, rv):
                    word = word[:-4]
            elif matched in sufs_er:
                p = len(word) - len(matched)
                if pos_ok(p, rv):
                    word = word[:p]
            elif matched in sufs_a:
                p = len(word) - len(matched)
                if pos_ok(p, rv):
                    word = word[:p]
                    if word.endswith("e") and pos_ok(len(word) - 1, rv):
                        word = word[:-1]
        altered = word != orig

    if altered:
        # step 3
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # step 4
        if word.endswith("s") and len(word) >= 2 and \
                word[-2].lower() not in "aiouès" and word[-2] != "H":
            word = word[:-1]
        if word.endswith("ion") and pos_ok(len(word) - 3, r2) and \
                len(word) >= 4 and word[-4] in "st":
            word = word[:-3]
        else:
            for suf, rep in (("ière", "i"), ("Ière", "i"), ("ier", "i"),
                             ("Ier", "i")):
                if word.endswith(suf):
                    if pos_ok(len(word) - len(suf), rv):
                        word = word[: -len(suf)] + rep
                    break
            else:
                if word.endswith("e") and pos_ok(len(word) - 1, rv):
                    word = word[:-1]

    # step 5: un-double
    for suf in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(suf):
            word = word[:-1]
            break
    # step 6: un-accent
    i = len(word) - 1
    while i >= 0 and word[i].lower() not in _FR_VOWELS:
        i -= 1
    if i >= 0 and word[i] in "éè" and i < len(word) - 1:
        word = word[:i] + "e" + word[i + 1:]
    return word.lower()


# ---------------------------------------------------------------------------
# Russian
# ---------------------------------------------------------------------------

_RU_VOWELS = set("аеиоуыэюя")

_RU_PERF_GERUND_1 = ("вшись", "вши", "в")
_RU_PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJECTIVE = ("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие",
                 "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
                 "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = ("ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло",
              "но", "ет", "ют", "ны", "ть", "й", "л", "н")
_RU_VERB_2 = ("ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли",
              "ило", "ыло", "ено", "ует", "уют", "ены", "ить", "ыть",
              "ишь", "ует", "ей", "уй", "ил", "ыл", "им", "ым", "ен",
              "ят", "ит", "ыт", "ую", "ю")
_RU_NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию",
            "ья", "ия", "ьи", "ии", "ей", "ой", "ий", "ям", "ем", "ам",
            "ом", "ах", "ях", "ью", "ев", "ов", "ие", "ье", "еи", "ью",
            "йо", "ю", "я", "й", "е", "и", "ы", "о", "у", "а", "ь")


def _ru_rv_r2(word: str) -> tuple[int, int]:
    n = len(word)
    rv = n
    for i in range(n):
        if word[i] in _RU_VOWELS:
            rv = i + 1
            break

    def region_after(start: int) -> int:
        for i in range(start, n - 1):
            if word[i] in _RU_VOWELS and word[i + 1] not in _RU_VOWELS:
                return i + 2
        return n
    r1 = region_after(0)
    r2 = region_after(r1)
    return rv, r2


def russian_stem(word: str) -> str:
    word = word.lower().replace("ё", "е")
    rv, r2 = _ru_rv_r2(word)

    def try_remove(sufs_1, sufs_2, base=None):
        """Longest match; group-1 suffixes require preceding а/я (which is
        NOT removed). Returns stemmed word or None."""
        w = word if base is None else base
        cands = []
        for s in sufs_2:
            if w.endswith(s) and len(w) - len(s) >= rv:
                cands.append((len(s), w[: -len(s)]))
        for s in sufs_1:
            if w.endswith(s):
                p = len(w) - len(s)
                if p >= 1 and w[p - 1] in "ая" and p >= rv:
                    cands.append((len(s), w[:p]))
        if not cands:
            return None
        return max(cands, key=lambda x: x[0])[1]

    # step 1
    out = try_remove(_RU_PERF_GERUND_1, _RU_PERF_GERUND_2)
    if out is None:
        w = word
        for refl in ("ся", "сь"):
            if w.endswith(refl) and len(w) - 2 >= rv:
                w = w[:-2]
                break
        # adjectival
        adj = None
        for s in sorted(_RU_ADJECTIVE, key=len, reverse=True):
            if w.endswith(s) and len(w) - len(s) >= rv:
                adj = w[: -len(s)]
                break
        if adj is not None:
            word2 = adj
            part = try_remove(_RU_PARTICIPLE_1, _RU_PARTICIPLE_2, base=word2)
            out = part if part is not None else word2
        else:
            out = try_remove(_RU_VERB_1, _RU_VERB_2, base=w)
            if out is None:
                for s in sorted(_RU_NOUN, key=len, reverse=True):
                    if w.endswith(s) and len(w) - len(s) >= rv:
                        out = w[: -len(s)]
                        break
                else:
                    out = w
    word = out

    # step 2
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]
    # step 3
    for s in ("ость", "ост"):
        if word.endswith(s) and len(word) - len(s) >= r2:
            word = word[: -len(s)]
            break
    # step 4
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        for s in ("ейше", "ейш"):
            if word.endswith(s) and len(word) - len(s) >= rv:
                word = word[: -len(s)]
                if word.endswith("нн") and len(word) - 1 >= rv:
                    word = word[:-1]
                break
        else:
            if word.endswith("ь") and len(word) - 1 >= rv:
                word = word[:-1]
    return word


STEMMERS = {
    "de": german_stem, "german": german_stem,
    "fr": french_stem, "french": french_stem,
    "ru": russian_stem, "russian": russian_stem,
}
