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


class _TrainerSpec:
    def __init__(self, data=b""):
        from _sp_pb2_helper import scalar_field

        self.model_type = scalar_field(data, 3, 1)  # UNIGRAM default


class _NormalizerSpec:
    def __init__(self, data=b""):
        from _sp_pb2_helper import scalar_field

        self.precompiled_charsmap = scalar_field(data, 2, b"") or b""
        self.add_dummy_prefix = bool(scalar_field(data, 3, 1))
        self.remove_extra_whitespaces = bool(scalar_field(data, 4, 1))


class _ModelProto:
    def ParseFromString(self, blob):
        from _sp_pb2_helper import submessages

        ts = submessages(blob, 2)
        ns = submessages(blob, 4)
        self.trainer_spec = _TrainerSpec(ts[0] if ts else b"")
        self.normalizer_spec = _NormalizerSpec(ns[0] if ns else b"")


class _Pb2Module:
    ModelProto = _ModelProto


sentencepiece_model_pb2 = _Pb2Module()
sys.modules["sentencepiece.sentencepiece_model_pb2"] = sentencepiece_model_pb2
