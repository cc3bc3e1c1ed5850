"""Minimal sentencepiece shim for running the REFERENCE converter in an
environment without the real package (tests/test_convert_ref_parity.py
prepends this dir to the subprocess PYTHONPATH). Backed by tpullama's
hand-rolled SPM ModelProto reader."""

import sys

sys.path.insert(0, "/root/repo")

from tpullama.tools.convert_hf import parse_spm_model  # noqa: E402

_NORMAL, _UNKNOWN, _CONTROL, _USER_DEFINED, _UNUSED, _BYTE = 1, 2, 3, 4, 5, 6


class SentencePieceProcessor:
    def __init__(self, *a, **k):
        self._pieces = []

    def LoadFromFile(self, path):
        self._pieces = parse_spm_model(path)
        return True

    def vocab_size(self):
        return len(self._pieces)

    def IdToPiece(self, i):
        return self._pieces[i][0]

    def GetScore(self, i):
        return self._pieces[i][1]

    def _t(self, i):
        return self._pieces[i][2]

    def IsUnknown(self, i):
        return self._t(i) == _UNKNOWN

    def IsControl(self, i):
        return self._t(i) == _CONTROL

    def IsUnused(self, i):
        return self._t(i) == _UNUSED

    def IsByte(self, i):
        return self._t(i) == _BYTE
