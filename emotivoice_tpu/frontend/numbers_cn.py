"""Arabic-numeral -> Chinese-numeral normalization.

Own implementation of the behavior the reference gets from the cn2an package
(`cn2an/an2cn.py`, used by `frontend_cn.py:90-94`): integer part read with
positional units (十百千 / 万 / 亿) and zero-compression, decimal part read
digit-by-digit after 点.
"""

from __future__ import annotations

DIGITS = "零一二三四五六七八九"
SMALL_UNITS = ["", "十", "百", "千"]
GROUP_UNITS = ["", "万", "亿", "万亿"]


def _four_digits_to_cn(chunk: str) -> str:
    """Convert an up-to-4-digit chunk, keeping internal zeros compressed."""
    out = []
    n = len(chunk)
    pending_zero = False
    for i, ch in enumerate(chunk):
        d = int(ch)
        unit = SMALL_UNITS[n - 1 - i]
        if d == 0:
            if any(int(c) for c in chunk[i + 1 :]):
                pending_zero = True
            continue
        if pending_zero:
            out.append("零")
            pending_zero = False
        out.append(DIGITS[d] + unit)
    return "".join(out)


def int_to_cn(s: str) -> str:
    s = s.lstrip("0") or "0"
    if s == "0":
        return "零"
    chunks = []
    while s:
        chunks.append(s[-4:])
        s = s[:-4]
    # chunks[0] = least significant group of 4 digits
    parts = []
    for gi in range(len(chunks) - 1, -1, -1):
        chunk = chunks[gi].rjust(4, "0") if gi != len(chunks) - 1 else chunks[gi]
        cn = _four_digits_to_cn(chunk)
        if not cn:
            continue
        # If a more significant group exists and this chunk has leading zeros,
        # a 零 separator is needed.
        if parts and len(chunks[gi].lstrip("0")) < 4 and not cn.startswith("零"):
            parts.append("零")
        parts.append(cn + GROUP_UNITS[gi])
    out = "".join(parts)
    # 一十X -> 十X at the very front (10..19 convention).
    if out.startswith("一十"):
        out = out[1:]
    return out


def decimal_to_cn(s: str) -> str:
    return "".join(DIGITS[int(c)] for c in s if c.isdigit())


def an2cn(number: str) -> str:
    """'123.45' -> '一百二十三点四五'. Non-numeric input returned unchanged."""
    number = number.strip()
    if not number:
        return number
    neg = number.startswith("-")
    if neg:
        number = number[1:]
    if number.count(".") > 1 or not number.replace(".", "").isdigit():
        return ("负" if neg else "") + number
    if "." in number:
        int_part, dec_part = number.split(".")
        cn = int_to_cn(int_part or "0")
        dec = decimal_to_cn(dec_part)
        out = cn + ("点" + dec if dec else "")
    else:
        out = int_to_cn(number)
    return ("负" if neg else "") + out
