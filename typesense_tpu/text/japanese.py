"""Japanese romanization — kakasi-style transliteration
(/root/reference/include/japanese_localizer.h: ja text is converted to
romaji before indexing so kana / kanji / romaji queries unify).

Deterministic Hepburn-ish mapping: full hiragana + katakana tables with
yōon digraphs (きゃ -> kya), sokuon gemination (っk -> kk), chōonpu long
vowels (ー repeats the previous vowel), plus an embedded on-reading table
for the most common kanji. Unknown kanji pass through as themselves, so
exact-form matching always still works.

Token scheme for a Japanese run (no spaces in the script): emit one UNIT
per kanji reading / contiguous kana subrun, then index units plus
adjacent-unit concatenations — the romaji analogue of the dictionary-free
CJK bigram scheme (text/tokenizer.py), which lets a whole-word kana query
("とうきょう" -> "toukyou") match a kanji document ("東京" -> units
["tou", "kyou"] + pair "toukyou").
"""

from __future__ import annotations

_BASE = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "wi", "ゑ": "we", "を": "wo", "ん": "n",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
    "ゔ": "vu",
}
_DIGRAPH_SECOND = {"ゃ": "ya", "ゅ": "yu", "ょ": "yo"}

# kanji -> most common (on/kun) reading; compact embedded table covering
# high-frequency characters (kakasi's kanwadict equivalent, abridged)
KANJI_READINGS = {
    "日": "nichi", "本": "hon", "人": "jin", "大": "dai", "年": "nen",
    "中": "chuu", "国": "koku", "出": "shutsu", "上": "jou", "学": "gaku",
    "生": "sei", "子": "ko", "分": "bun", "東": "tou", "京": "kyou",
    "間": "kan", "高": "kou", "女": "jo", "三": "san", "二": "ni",
    "一": "ichi", "四": "yon", "五": "go", "六": "roku", "七": "nana",
    "八": "hachi", "九": "kyuu", "十": "juu", "百": "hyaku", "千": "sen",
    "万": "man", "円": "en", "時": "ji", "行": "kou", "見": "ken",
    "月": "getsu", "後": "go", "前": "zen", "名": "mei", "新": "shin",
    "車": "sha", "語": "go", "読": "doku", "書": "sho", "食": "shoku",
    "飲": "in", "会": "kai", "社": "sha", "駅": "eki", "道": "dou",
    "山": "yama", "川": "kawa", "水": "sui", "火": "ka", "木": "moku",
    "金": "kin", "土": "do", "天": "ten", "気": "ki", "雨": "ame",
    "電": "den", "話": "wa", "買": "bai", "物": "butsu", "店": "ten",
    "屋": "ya", "家": "ka", "外": "gai", "内": "nai", "南": "nan",
    "北": "hoku", "西": "sei", "口": "kou", "手": "te", "足": "ashi",
    "目": "me", "耳": "mimi", "先": "sen", "今": "kon", "何": "nani",
    "来": "rai", "帰": "ki", "休": "kyuu", "言": "gen", "立": "ritsu",
    "入": "nyuu", "小": "shou", "少": "shou", "多": "ta", "早": "sou",
    "長": "chou", "白": "haku", "安": "an", "空": "kuu", "海": "kai",
    "魚": "sakana", "犬": "inu", "猫": "neko", "花": "hana", "文": "bun",
    "字": "ji", "校": "kou", "私": "watashi", "友": "yuu", "達": "tachi",
    "町": "machi", "村": "mura", "市": "shi", "都": "to", "府": "fu",
    "県": "ken", "区": "ku", "島": "shima", "世": "se", "界": "kai",
    "王": "ou", "味": "mi", "料": "ryou", "理": "ri", "肉": "niku",
    "野": "ya", "菜": "sai", "茶": "cha", "酒": "shu", "米": "kome",
    "毎": "mai", "週": "shuu", "曜": "you", "半": "han", "午": "go",
    "夜": "yoru", "朝": "asa", "昼": "hiru", "晩": "ban", "夕": "yuu",
    "方": "hou", "風": "kaze", "雪": "yuki", "春": "haru", "夏": "natsu",
    "秋": "aki", "冬": "fuyu", "色": "iro", "赤": "aka", "青": "ao",
    "黒": "kuro", "音": "on", "楽": "gaku", "歌": "ka", "映": "ei",
    "画": "ga", "写": "sha", "真": "shin", "旅": "ryo", "館": "kan",
    "病": "byou", "院": "in", "医": "i", "者": "sha", "薬": "yaku",
    "体": "karada", "頭": "atama", "顔": "kao", "心": "kokoro",
    "思": "shi", "知": "chi", "考": "kou", "教": "kyou", "室": "shitsu",
    "授": "ju", "業": "gyou", "宿": "shuku", "題": "dai", "試": "shi",
    "験": "ken", "質": "shitsu", "問": "mon", "答": "tou", "英": "ei",
    "漢": "kan", "仕": "shi", "事": "ji", "働": "dou", "銀": "gin",
    "郵": "yuu", "便": "bin", "局": "kyoku", "図": "to", "公": "kou",
    "園": "en", "門": "mon", "開": "kai", "閉": "hei", "始": "shi",
    "終": "shuu", "動": "dou", "止": "shi", "歩": "ho", "走": "sou",
    "乗": "jou", "降": "kou", "着": "chaku", "渡": "to", "通": "tsuu",
    "送": "sou", "使": "shi", "作": "saku", "持": "ji", "待": "tai",
    "売": "bai", "貸": "tai", "借": "shaku", "返": "hen", "忘": "bou",
    "覚": "kaku", "習": "shuu", "練": "ren", "勉": "ben", "強": "kyou",
    "研": "ken", "究": "kyuu", "留": "ryuu", "卒": "sotsu",
    "住": "juu", "所": "sho", "場": "jou", "地": "chi", "平": "hei",
    "和": "wa", "正": "sei", "同": "dou", "親": "shin", "切": "setsu",
    "古": "ko", "悪": "aku", "重": "juu", "軽": "kei", "近": "kin",
    "遠": "en", "広": "kou", "太": "futo", "元": "gen", "有": "yuu",
    "無": "mu", "不": "fu", "可": "ka", "能": "nou", "力": "ryoku",
    "自": "ji", "転": "ten", "運": "un", "泳": "ei", "計": "kei",
}


def _kata_to_hira(ch: str) -> str:
    cp = ord(ch)
    if 0x30A1 <= cp <= 0x30F6:
        return chr(cp - 0x60)
    return ch


def kana_to_romaji(text: str) -> str:
    """Transliterate a kana (hiragana/katakana) string to romaji."""
    out: list[str] = []
    geminate = False
    i = 0
    n = len(text)
    while i < n:
        ch = _kata_to_hira(text[i])
        if ch in ("っ", "ッ"):
            geminate = True
            i += 1
            continue
        if ch == "ー":
            if out and out[-1] and out[-1][-1] in "aiueo":
                out.append(out[-1][-1])
            i += 1
            continue
        nxt = _kata_to_hira(text[i + 1]) if i + 1 < n else ""
        if nxt in _DIGRAPH_SECOND and ch in _BASE and \
                _BASE[ch].endswith("i"):
            head = _BASE[ch][:-1]
            if head.endswith(("sh", "ch", "j")):
                # しゃ -> sha, ちゅ -> chu, じょ -> jo
                syll = head + _DIGRAPH_SECOND[nxt][1:]
            else:
                syll = head + _DIGRAPH_SECOND[nxt]
            i += 2
        elif ch in _BASE:
            syll = _BASE[ch]
            i += 1
        else:
            syll = ch
            i += 1
        if geminate and syll and syll[0].isalpha():
            syll = syll[0] + syll
        geminate = False
        out.append(syll)
    return "".join(out)


def _is_kana(ch: str) -> bool:
    cp = ord(ch)
    return 0x3040 <= cp <= 0x30FF


def ja_units(run: str) -> list[str]:
    """Split a Japanese run into romaji units: one per kanji (reading or
    the raw character), one per contiguous kana subrun."""
    units: list[str] = []
    kana: list[str] = []

    def flush_kana():
        if kana:
            units.append(kana_to_romaji("".join(kana)))
            kana.clear()

    for ch in run:
        if _is_kana(ch) or ch == "ー":
            kana.append(ch)
        else:
            flush_kana()
            units.append(KANJI_READINGS.get(ch, ch))
    flush_kana()
    return [u for u in units if u]
