"""Shared minimal sentencepiece ModelProto field reader."""


def read_varint(b, i):
    r = s = 0
    while True:
        x = b[i]
        i += 1
        r |= (x & 0x7F) << s
        if not x & 0x80:
            return r, i
        s += 7


def submessages(data, want_field):
    i, n = 0, len(data)
    out = []
    while i < n:
        tag, i = read_varint(data, i)
        f, w = tag >> 3, tag & 7
        if w == 2:
            ln, i = read_varint(data, i)
            if f == want_field:
                out.append(data[i:i + ln])
            i += ln
        elif w == 0:
            _, i = read_varint(data, i)
        elif w == 5:
            i += 4
        elif w == 1:
            i += 8
    return out


def scalar_field(data, want_field, default=None):
    i, n = 0, len(data)
    val = default
    while i < n:
        tag, i = read_varint(data, i)
        f, w = tag >> 3, tag & 7
        if w == 0:
            v, i = read_varint(data, i)
            if f == want_field:
                val = v
        elif w == 2:
            ln, i = read_varint(data, i)
            if f == want_field:
                val = data[i:i + ln]
            i += ln
        elif w == 5:
            i += 4
        elif w == 1:
            i += 8
    return val
