"""UGM (unigram / T5-family) tokenizer.

Reference parity: llm_tokenizer_ugm + llm_tokenizer_ugm_session
(src/llama-vocab.cpp:772-1050): sentencepiece-style Viterbi over a token
trie with double-precision score sums, normalization through the
precompiled charsmap (XOR-compressed compact double array of prefix
replacements), user-defined-token passthrough, and the reference's
whitespace prepend/merge/escape rules.
"""

from __future__ import annotations

import struct

UNKNOWN_PENALTY = 10.0
ESCAPED_SPACE = "▁"  # ▁
REPLACEMENT = b"\xef\xbf\xbd"  # U+FFFD


class _Trie:
    __slots__ = ("children", "value")

    def __init__(self):
        self.children: dict[int, _Trie] = {}
        self.value = None

    def insert(self, data: bytes, value):
        node = self
        for b in data:
            nxt = node.children.get(b)
            if nxt is None:
                nxt = node.children[b] = _Trie()
            node = nxt
        node.value = value

    def longest_prefix(self, data: bytes) -> int:
        """Length of the longest inserted key that prefixes `data` (0 if
        none) — naive_trie::get_longest_prefix."""
        node = self
        best = 0
        for i, b in enumerate(data):
            node = node.children.get(b)
            if node is None:
                break
            if node.value is not None:
                best = i + 1
        return best


def _utf8_len(b0: int) -> int:
    # unicode_len_utf8: lookup on the high nibble
    return (1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 3, 4)[b0 >> 4]


def _valid_utf8_cpt(data: bytes, off: int) -> int:
    """Length of a strictly valid UTF-8 code point at off, else 0
    (unicode_cpt_from_utf8's validation)."""
    b0 = data[off]
    if b0 < 0x80:
        return 1
    for ln, lead, lead_mask in ((2, 0xC0, 0xE0), (3, 0xE0, 0xF0), (4, 0xF0, 0xF8)):
        if (b0 & lead_mask) == lead:
            if off + ln > len(data):
                return 0
            if all((data[off + i] & 0xC0) == 0x80 for i in range(1, ln)):
                return ln
            return 0
    return 0


class XcdaView:
    """xcda_array_view (llama-vocab.cpp): bit-packed double-array nodes
    (BASE bits 10-30, LEAF bit 8, LCHECK bits 0-7 | bit 31)."""

    def __init__(self, arr):
        self.arr = arr

    def node(self, i):
        if i >= len(self.arr):
            raise IndexError("xcda index out of bounds")
        return int(self.arr[i])

    def base(self, i):
        p = self.node(i)
        return (p >> 10) << ((p & (1 << 9)) >> 6)

    def lcheck(self, i):
        p = self.node(i)
        return p & ((1 << 31) | 0xFF)

    def leaf(self, i):
        return (self.node(i) >> 8) & 1

    def value(self, i):
        return self.node(i) & ((1 << 31) - 1)


class UgmTokenizer:
    def __init__(self, vocab, precompiled_charsmap: bytes | None = None):
        import numpy as np

        self.vocab = vocab
        self.xcda = None
        self.replacements = b""
        if precompiled_charsmap:
            blob = bytes(precompiled_charsmap)
            (xcda_size,) = struct.unpack_from("<I", blob, 0)
            if xcda_size + 4 >= len(blob):
                raise ValueError("bad precompiled charsmap")
            self.xcda = XcdaView(
                np.frombuffer(blob, dtype="<u4", count=xcda_size // 4, offset=4)
            )
            self.replacements = blob[4 + xcda_size :]

        from .vocab import TokenAttr

        self.trie = _Trie()
        self.user_defined = _Trie()
        min_score = float("inf")
        for tid, td in enumerate(vocab.id_to_token):
            attr = td.attr
            if attr & TokenAttr.NORMAL:
                min_score = min(min_score, td.score)
            if attr & (TokenAttr.NORMAL | TokenAttr.USER_DEFINED | TokenAttr.UNUSED):
                self.trie.insert(td.text.encode("utf-8"), tid)
            if attr & TokenAttr.USER_DEFINED:
                self.user_defined.insert(td.text.encode("utf-8"), True)
        self._user_defined_ids = {
            tid for tid, td in enumerate(vocab.id_to_token)
            if td.attr & TokenAttr.USER_DEFINED
        }
        self.unknown_score = (min_score if min_score != float("inf") else 0.0) - UNKNOWN_PENALTY

    # ------------------------------------------------------ normalization

    def _normalize_prefix(self, data: bytes, off: int):
        """(normalized_bytes, consumed) — normalize_prefix."""
        n_ud = self.user_defined.longest_prefix(data[off:])
        if n_ud > 0:
            return data[off : off + n_ud], n_ud

        longest_len = 0
        longest_off = 0
        if self.xcda is not None:
            try:
                node = self.xcda.base(0)
                for p in range(off, len(data)):
                    c = data[p]
                    if c == 0:
                        break
                    node ^= c
                    if self.xcda.lcheck(node) != c:
                        break
                    is_leaf = self.xcda.leaf(node)
                    node ^= self.xcda.base(node)
                    if is_leaf:
                        longest_len = p - off + 1
                        longest_off = self.xcda.value(node)
            except IndexError:
                pass
        if longest_len > 0:
            end = self.replacements.index(b"\0", longest_off)
            return self.replacements[longest_off:end], longest_len

        ln = _valid_utf8_cpt(data, off)
        if ln:
            return data[off : off + ln], ln
        return REPLACEMENT, 1

    def normalize(self, text: str) -> bytes:
        v = self.vocab
        data = text.encode("utf-8")
        space = ESCAPED_SPACE.encode("utf-8") if v.escape_whitespaces else b" "
        prepend = not v.treat_whitespace_as_suffix and v.add_space_prefix
        append = v.treat_whitespace_as_suffix and v.add_space_prefix
        merge = v.remove_extra_whitespaces

        out = bytearray()
        space_prepended = False
        non_ws = False
        off = 0
        while off < len(data):
            norm, consumed = self._normalize_prefix(data, off)
            for c in norm:
                if c != 0x20:
                    if not non_ws:
                        non_ws = True
                        if (prepend and not space_prepended) or merge:
                            out += space
                            space_prepended = True
                    out.append(c)
                else:
                    if non_ws:
                        non_ws = False
                    if not merge:
                        out += space
            off += consumed
        if append:
            out += space
        return bytes(out)

    # ------------------------------------------------------------ viterbi

    def tokenize(self, text: str) -> list[int]:
        v = self.vocab
        data = self.normalize(text)
        n = len(data)
        if n == 0:
            return []
        unk = v.unk_id
        # (token_id, input_offset, score_sum)
        results = [(unk, 0, float("-inf"))] * (n + 1)
        results[0] = (unk, 0, 0.0)

        off = 0
        while off < n:
            n_units = min(_utf8_len(data[off]), n - off)
            cur_score = results[off][2]
            single_cpt_found = False
            node = self.trie.children.get(data[off])
            p = off + 1
            while node is not None:
                if node.value is not None:
                    if p - off == n_units:
                        single_cpt_found = True
                    tid = node.value
                    score = 0.0 if tid in self._user_defined_ids else v.id_to_token[tid].score
                    challenger = cur_score + score
                    if challenger > results[p][2]:
                        results[p] = (tid, off, challenger)
                if p >= n:
                    break
                node = node.children.get(data[p])
                p += 1
            if not single_cpt_found:
                challenger = cur_score + self.unknown_score
                p = off + n_units
                if challenger > results[p][2]:
                    results[p] = (unk, off, challenger)
            off += n_units

        # backtrack, merging consecutive unknowns
        out = []
        prev_unknown = False
        pos = n
        while True:
            tid, in_off, _ = results[pos]
            is_unknown = tid == unk
            if not (prev_unknown and is_unknown):
                out.append(tid)
            if in_off == 0:
                break
            prev_unknown = is_unknown
            pos = in_off
        out.reverse()
        return out
