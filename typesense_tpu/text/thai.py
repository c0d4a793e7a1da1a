"""Thai word segmentation — dictionary-based maximal matching, the ICU
dictionary-break-iterator equivalent (/root/reference/include/
tokenizer.h:31: th routes through ICU's dictionary BreakIterator).

Thai is written without spaces; the embedded lexicon covers the
high-frequency function words + common vocabulary, segmented by greedy
longest-match (ties to the dictionary). Out-of-vocabulary spans fall back
to Thai-cluster bigrams (the previous dictionary-free behavior) so
unknown words still match as substrings.
"""

from __future__ import annotations

# high-frequency Thai lexicon (function words, pronouns, common nouns/verbs)
_WORDS = """
สวัสดี ครับ ค่ะ คะ ขอบคุณ ไม่ ใช่ ได้ แล้ว กำลัง จะ ต้อง อยาก เป็น อยู่ คือ
มี ไป มา ทำ กิน ดื่ม นอน เดิน วิ่ง พูด อ่าน เขียน ฟัง ดู เห็น รู้ คิด รัก ชอบ
ซื้อ ขาย ให้ เอา ใช้ เล่น เรียน สอน ทำงาน ช่วย รอ หยุด เปิด ปิด เริ่ม จบ
ผม ฉัน ดิฉัน คุณ เขา เธอ เรา มัน พวกเขา ตัวเอง ใคร อะไร ที่ไหน เมื่อไหร่
ทำไม อย่างไร ยังไง นี่ นั่น โน่น นี้ นั้น ทุก บาง หลาย น้อย มาก ที่สุด กว่า
และ หรือ แต่ เพราะ ถ้า เมื่อ จึง ก็ ด้วย กับ ของ ใน บน ใต้ หน้า หลัง ข้าง
ระหว่าง จาก ถึง ตั้งแต่ จนถึง เพื่อ โดย ตาม ประมาณ เกือบ พอ เท่านั้น
คน ผู้ชาย ผู้หญิง เด็ก พ่อ แม่ ลูก พี่ น้อง เพื่อน ครู นักเรียน หมอ ตำรวจ
บ้าน โรงเรียน โรงพยาบาล ตลาด ร้าน ร้านอาหาร วัด เมือง ประเทศ ถนน รถ
รถยนต์ รถไฟ เครื่องบิน เรือ จักรยาน น้ำ ข้าว อาหาร ผลไม้ ผัก เนื้อ หมู ไก่
ปลา กุ้ง ไข่ นม กาแฟ ชา เบียร์ ขนม ผลไม้ ส้ม กล้วย มะม่วง ทุเรียน แตงโม
หนังสือ ปากกา ดินสอ กระดาษ โต๊ะ เก้าอี้ ประตู หน้าต่าง ห้อง ห้องน้ำ ครัว
เงิน บาท ราคา ถูก แพง ฟรี ซื้อของ ตลาดนัด เวลา วัน คืน เช้า สาย บ่าย เย็น
กลางคืน กลางวัน วันนี้ พรุ่งนี้ เมื่อวาน สัปดาห์ เดือน ปี ชั่วโมง นาที
วินาที จันทร์ อังคาร พุธ พฤหัสบดี ศุกร์ เสาร์ อาทิตย์ มกราคม กุมภาพันธ์
หนึ่ง สอง สาม สี่ ห้า หก เจ็ด แปด เก้า สิบ ร้อย พัน หมื่น แสน ล้าน ศูนย์
ใหญ่ เล็ก สูง เตี้ย ยาว สั้น ใหม่ เก่า ดี เลว สวย น่ารัก อร่อย หวาน เผ็ด
เค็ม เปรี้ยว ขม ร้อน หนาว เย็นสบาย เร็ว ช้า ง่าย ยาก สนุก เบื่อ เหนื่อย
หิว อิ่ม ป่วย สบาย ดีใจ เสียใจ โกรธ กลัว ตกใจ แปลกใจ สี แดง เขียว เหลือง
ฟ้า น้ำเงิน ขาว ดำ ชมพู ม่วง ส้ม น้ำตาล เทา ทอง ภาษา ไทย อังกฤษ จีน ญี่ปุ่น
เกาหลี ฝรั่งเศส เยอรมัน ประเทศไทย กรุงเทพ เชียงใหม่ ภูเก็ต พัทยา อยุธยา
แม่น้ำ ภูเขา ทะเล เกาะ ป่า ฝน แดด ลม หิมะ เมฆ ฟ้าร้อง อากาศ ฤดู ร้อนมาก
หมา แมว ช้าง ม้า วัว ควาย นก งู เสือ ลิง หนู กบ ต้นไม้ ดอกไม้ ใบไม้ หญ้า
""".split()

_LEXICON = set(_WORDS)
_MAX_LEN = max(len(w) for w in _WORDS)

_THAI_COMBINING = set(
    "ัิีึืฺุู"
    "็่้๊๋์ํ๎")


def _clusters(text: str) -> list[str]:
    """Greedy grapheme-ish clusters: base char + combining marks (a Thai
    character cell); leading vowels attach forward."""
    out: list[str] = []
    i = 0
    n = len(text)
    LEAD = set("เแโใไ")  # เ แ โ ใ ไ
    while i < n:
        c = text[i]
        cluster = c
        i += 1
        if c in LEAD and i < n:
            cluster += text[i]
            i += 1
        while i < n and text[i] in _THAI_COMBINING:
            cluster += text[i]
            i += 1
        out.append(cluster)
    return out


def segment_thai(text: str) -> list[str]:
    """Greedy longest-match against the lexicon; OOV spans become
    cluster bigrams (single cluster when the span is one cluster)."""
    tokens: list[str] = []
    oov: list[str] = []

    def flush_oov():
        if not oov:
            return
        span = "".join(oov)
        cl = _clusters(span)
        if len(cl) <= 2:
            tokens.append(span)
        else:
            for j in range(len(cl) - 1):
                tokens.append(cl[j] + cl[j + 1])
        oov.clear()

    i = 0
    n = len(text)
    while i < n:
        match = None
        for ln in range(min(_MAX_LEN, n - i), 0, -1):
            if text[i:i + ln] in _LEXICON:
                match = text[i:i + ln]
                break
        if match:
            flush_oov()
            tokens.append(match)
            i += len(match)
        else:
            oov.append(text[i])
            i += 1
    flush_oov()
    return tokens
