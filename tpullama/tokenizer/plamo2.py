"""PLaMo-2 tokenizer: Aho–Corasick-style reversed-suffix table + DP
segmentation.

Behavioral parity with llm_tokenizer_plamo2 (src/llama-vocab.cpp:
1228-1493): the vocab's pieces and all their proper suffixes are sorted
by REVERSED string; each suffix owns a run of table rows listing its
prefixes that are known pieces (longest first, score in 1e4 fixed
point), closed by a sentinel row with UNKNOWN_SCORE. A (codepoint,
suffix_id) -> suffix_id map walks the automaton right-to-left while a
Viterbi DP picks the minimal-cost segmentation (unknown codepoints cost
one UNKNOWN step and fall back to raw UTF-8 byte tokens).
"""

from __future__ import annotations

UNKNOWN_SCORE = -10000000
INVALID_SCORE = -20000000

# table row fields
_LEN, _TOKEN, _SCORE, _PIECE = 0, 1, 2, 3


class Plamo2Tokenizer:
    def __init__(self, vocab):
        self.bytes = [0] * 256
        suffix_to_score: dict[str, float] = {}
        token_to_id: dict[str, int] = {}
        nan = float("nan")

        from .vocab import TokenAttr

        for tid, data in enumerate(vocab.id_to_token):
            text = data.text
            token_to_id[text] = tid
            if data.attr & TokenAttr.BYTE:
                if len(text) == 6 and text[:3] == "<0x" and text[-1] == ">":
                    self.bytes[int(text[3:5], 16)] = tid
                continue
            suffix_to_score[text] = data.score
            for i in range(1, len(text)):
                suffix_to_score.setdefault(text[i:], nan)

        for b in range(256):
            if self.bytes[b] == 0:
                raise ValueError(f"PLaMo2 vocab: byte token <0x{b:02X}> missing")

        # suffixes sorted by reversed string; '' first
        suffixes = sorted(suffix_to_score, key=lambda s: s[::-1])
        suffixes.insert(0, "")

        # suffix -> id (row index of its table run) + automaton transitions
        suffix_to_id: dict[str, int] = {}
        self.to_suffix_id: dict[int, int] = {}  # (cpt << 32 | suffix_id) -> id
        num_pieces = 0
        for suffix in suffixes:
            suffix_to_id[suffix] = num_pieces
            if suffix:
                code = (ord(suffix[0]) << 32) | suffix_to_id[suffix[1:]]
                self.to_suffix_id[code] = num_pieces
                count = 1  # sentinel row
                for plen in range(len(suffix), 0, -1):
                    if suffix[:plen] in suffix_to_score:
                        count += 1
                num_pieces += count
            else:
                num_pieces += 1  # sentinel only

        table = [[0, 0, 0, 0] for _ in range(num_pieces)]
        idx = 0
        isfinite = lambda x: x == x and abs(x) != float("inf")
        for suffix in suffixes:
            for plen in range(len(suffix), 0, -1):
                piece = suffix[:plen]
                score = suffix_to_score.get(piece)
                if score is None:
                    continue
                row = table[idx]
                row[_LEN] = plen
                row[_TOKEN] = token_to_id.get(piece, -1)
                row[_SCORE] = (
                    int(round(score * 1e4)) if isfinite(score) else INVALID_SCORE
                )
                row[_PIECE] = suffix_to_id[piece]
                idx += 1
            sent = table[idx]
            sent[_LEN] = 1
            sent[_TOKEN] = -1
            sent[_SCORE] = UNKNOWN_SCORE
            idx += 1
        self.table = table

    def encode(self, text: str) -> list[int]:
        if text and text[0] == "﻿":  # strip BOM
            text = text[1:]
        if not text:
            return []
        n = len(text)
        INF = 1 << 60
        scores = [INF] * (n + 1)
        scores[n] = 0
        path_len = [0] * (n + 1)
        path_tok = [0] * (n + 1)
        table = self.table
        to_suffix = self.to_suffix_id

        suffix_id = 0
        for i in range(n - 1, -1, -1):
            c = ord(text[i])
            # automaton step: find this position's suffix id
            p = suffix_id
            while p < len(table):
                code = (c << 32) | table[p][_PIECE]
                suffix_id = to_suffix.get(code, 0)
                if suffix_id > 0 or table[p][_SCORE] == UNKNOWN_SCORE:
                    break
                p += 1

            # DP relax over this suffix's piece run
            p = suffix_id
            while p < len(table):
                row = table[p]
                score = row[_SCORE]
                if score > INVALID_SCORE:
                    plen = row[_LEN]
                    s = scores[i + plen] - score
                    if s < scores[i]:
                        scores[i] = s
                        path_len[i] = plen
                        path_tok[i] = row[_TOKEN]
                if score == UNKNOWN_SCORE:
                    break
                p += 1

        out: list[int] = []
        pos = 0
        while pos < n:
            if path_tok[pos] >= 0:
                out.append(path_tok[pos])
            else:
                for b in text[pos].encode("utf-8"):
                    out.append(self.bytes[b])
            pos += path_len[pos]
        return out
