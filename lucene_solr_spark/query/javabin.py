"""javabin — the SolrJ binary wire format (BinaryResponseWriter /
JavaBinCodec), byte-compatible with version 2.

Reference (solr/solrj/src/java/org/apache/solr/common/util/
JavaBinCodec.java):
- tag bytes (java:43-75): NULL/BOOL/BYTE/SHORT/DOUBLE/INT/LONG/FLOAT/
  DATE/MAP/SOLRDOC/SOLRDOCLST/BYTEARR/ITERATOR/END plus the
  tag-and-length family in the upper 3 bits: STR, SINT, SLONG, ARR,
  ORDERED_MAP (SimpleOrderedMap), NAMED_LST, EXTERN_STRING.
- writeTag(tag,size) (java:285-297): size < 0x1f packs into the tag
  byte, else 0x1f marker + vint(size-0x1f).
- small-int/long packing (java:488-540): positive values put their low
  4 bits in the tag with a 0x10 continuation bit and the rest as
  vint/vlong; zero and negatives take the full big-endian form; longs
  use the compact form only when the top byte is clear.
- extern strings (java:668-686): NamedList names, map string keys and
  doc field names write EXTERN_STRING with a back-reference index into
  the per-stream string table (0 = inline definition) — repeated field
  names across documents cost one byte.
- SolrDocumentList (java:349-357): [numFound(long), start(long),
  maxScore(float-or-null)] then the docs array, each doc an
  ORDERED_MAP behind a SOLRDOC tag.

Byte parity is proven against the reference codec compiled from the
tree (tools/javabin_oracle.py): golden vectors byte-identical, and
fuzzed Python-marshaled trees survive a reference unmarshal→marshal
round trip unchanged (tests/test_javabin.py).

Python type mapping: int → Java Integer when it fits in 32 bits else
Long (force Long with JLong for fields like numFound), float → Double,
response_writers.F32 → Float, dict → SimpleOrderedMap (matching the
text writers' convention), NamedList → NAMED_LST, JavaMap → MAP,
DocList → SolrDocumentList, datetime → Date (UTC millis), bytes →
BYTEARR.
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone
from typing import Any

from .response_writers import F32, DocList, NamedList

__all__ = ["JLong", "JavaMap", "dumps", "loads", "END_OBJ"]

VERSION = 2

NULL, BOOL_TRUE, BOOL_FALSE, BYTE, SHORT, DOUBLE, INT, LONG, FLOAT, \
    DATE, MAP, SOLRDOC, SOLRDOCLST, BYTEARR, ITERATOR, END = range(16)
SOLRINPUTDOC = 16
STR = 1 << 5
SINT = 2 << 5
SLONG = 3 << 5
ARR = 4 << 5
ORDERED_MAP = 5 << 5
NAMED_LST = 6 << 5
EXTERN_STRING = 7 << 5


class JLong(int):
    """Force the Java Long encoding for an int that fits in 32 bits."""


class JavaMap(dict):
    """Force the MAP tag (java.util.Map) instead of SimpleOrderedMap."""


class _EndObj:
    pass


END_OBJ = _EndObj()


class _Encoder:
    def __init__(self):
        self.out = bytearray()
        self.strings: dict[str, int] = {}

    # -- low-level ---------------------------------------------------------
    def _vint(self, i: int) -> None:
        while i & ~0x7F:
            self.out.append((i & 0x7F) | 0x80)
            i >>= 7
        self.out.append(i)

    def _tag(self, tag: int, size: int) -> None:
        if tag & 0xE0:
            if size < 0x1F:
                self.out.append(tag | size)
            else:
                self.out.append(tag | 0x1F)
                self._vint(size - 0x1F)
        else:
            self.out.append(tag)
            self._vint(size)

    def _write_str(self, s: str) -> None:
        b = s.encode("utf-8")
        self._tag(STR, len(b))
        self.out += b

    def _extern_string(self, s: str | None) -> None:
        if s is None:
            self.out.append(NULL)
            return
        s = str(s)
        idx = self.strings.get(s, 0)
        self._tag(EXTERN_STRING, idx)
        if idx == 0:
            self._write_str(s)
            self.strings[s] = len(self.strings) + 1

    def _write_int(self, v: int) -> None:
        if v > 0:
            b = SINT | (v & 0x0F)
            if v >= 0x0F:
                self.out.append(b | 0x10)
                self._vint(v >> 4)
            else:
                self.out.append(b)
        else:
            self.out.append(INT)
            self.out += struct.pack(">i", v)

    def _write_long(self, v: int) -> None:
        if (v & 0xFF00000000000000) == 0 and v >= 0:
            b = SLONG | (v & 0x0F)
            if v >= 0x0F:
                self.out.append(b | 0x10)
                self._vint(v >> 4)
            else:
                self.out.append(b)
        else:
            self.out.append(LONG)
            self.out += struct.pack(">q", v)

    # -- dispatch ----------------------------------------------------------
    def write_val(self, v: Any) -> None:
        if v is None:
            self.out.append(NULL)
        elif isinstance(v, bool):
            self.out.append(BOOL_TRUE if v else BOOL_FALSE)
        elif isinstance(v, JLong):
            self._write_long(int(v))
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                self._write_int(v)
            else:
                self._write_long(v)
        elif isinstance(v, F32):
            self.out.append(FLOAT)
            self.out += struct.pack(">f", float(v))
        elif isinstance(v, float):
            self.out.append(DOUBLE)
            self.out += struct.pack(">d", v)
        elif isinstance(v, str):
            self._write_str(v)
        elif isinstance(v, datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=timezone.utc)
            self.out.append(DATE)
            self.out += struct.pack(">q", int(v.timestamp() * 1000))
        elif isinstance(v, (bytes, bytearray)):
            self._tag(BYTEARR, len(v))
            self.out += bytes(v)
        elif isinstance(v, DocList):
            self.out.append(SOLRDOCLST)
            self.write_val([JLong(v.num_found), JLong(v.start),
                            F32(v.max_score)
                            if v.max_score is not None else None])
            self._tag(ARR, len(v.docs))
            for doc in v.docs:
                self.out.append(SOLRDOC)
                self._tag(ORDERED_MAP, len(doc))
                for k, val in doc.items():
                    self._extern_string(k)
                    self.write_val(val)
        elif isinstance(v, NamedList):
            # nl.ordered marks SimpleOrderedMap (the response root and
            # anything decoded from an ORDERED_MAP tag)
            self._tag(ORDERED_MAP if getattr(v, "ordered", False)
                      else NAMED_LST, len(v.pairs))
            for k, val in v.pairs:
                self._extern_string(k)
                self.write_val(val)
        elif isinstance(v, JavaMap):
            self._tag(MAP, len(v))
            for k, val in v.items():
                if isinstance(k, str):
                    self._extern_string(k)
                else:
                    self.write_val(k)
                self.write_val(val)
        elif isinstance(v, dict):  # SimpleOrderedMap
            self._tag(ORDERED_MAP, len(v))
            for k, val in v.items():
                self._extern_string(str(k))
                self.write_val(val)
        elif isinstance(v, (list, tuple)):
            self._tag(ARR, len(v))
            for x in v:
                self.write_val(x)
        elif v is END_OBJ:
            self.out.append(END)
        else:
            self._write_str(str(v))


def dumps(obj: Any) -> bytes:
    """JavaBinCodec.marshal: version byte + the value tree."""
    enc = _Encoder()
    enc.out.append(VERSION)
    enc.write_val(obj)
    return bytes(enc.out)


class _Decoder:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.strings: list[str] = []

    def _byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def _read(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def _vint(self) -> int:
        b = self._byte()
        i = b & 0x7F
        shift = 7
        while b & 0x80:
            b = self._byte()
            i |= (b & 0x7F) << shift
            shift += 7
        return i

    def _size(self, tag: int) -> int:
        sz = tag & 0x1F
        if sz == 0x1F:
            sz += self._vint()
        return sz

    def read_val(self) -> Any:
        tag = self._byte()
        high = tag >> 5
        if high == STR >> 5:
            return self._read(self._size(tag)).decode("utf-8")
        if high == SINT >> 5:
            v = tag & 0x0F
            if tag & 0x10:
                v = (self._vint() << 4) | v
            return v
        if high == SLONG >> 5:
            v = tag & 0x0F
            if tag & 0x10:
                v = (self._vint() << 4) | v
            return JLong(v)
        if high == ARR >> 5:
            return [self.read_val() for _ in range(self._size(tag))]
        if high == ORDERED_MAP >> 5 or high == NAMED_LST >> 5:
            nl = NamedList()
            for _ in range(self._size(tag)):
                name = self.read_val()
                nl.add(name, self.read_val())
            if high == ORDERED_MAP >> 5:
                nl.ordered = True  # SimpleOrderedMap marker
            return nl
        if high == EXTERN_STRING >> 5:
            idx = self._size(tag)
            if idx:
                return self.strings[idx - 1]
            s = self.read_val()
            self.strings.append(s)
            return s
        if tag == NULL:
            return None
        if tag == BOOL_TRUE:
            return True
        if tag == BOOL_FALSE:
            return False
        if tag == INT:
            return struct.unpack(">i", self._read(4))[0]
        if tag == LONG:
            return JLong(struct.unpack(">q", self._read(8))[0])
        if tag == FLOAT:
            return F32(struct.unpack(">f", self._read(4))[0])
        if tag == DOUBLE:
            return struct.unpack(">d", self._read(8))[0]
        if tag == BYTE:
            return struct.unpack(">b", self._read(1))[0]
        if tag == SHORT:
            return struct.unpack(">h", self._read(2))[0]
        if tag == DATE:
            millis = struct.unpack(">q", self._read(8))[0]
            return datetime.fromtimestamp(millis / 1000.0, tz=timezone.utc)
        if tag == BYTEARR:
            return self._read(self._vint())
        if tag == MAP:
            m = JavaMap()
            for _ in range(self._vint()):
                k = self.read_val()
                m[k] = self.read_val()
            return m
        if tag == SOLRDOC:
            nl = self.read_val()
            return dict(nl.pairs)
        if tag == SOLRDOCLST:
            hdr = self.read_val()
            docs = self.read_val()
            return DocList(int(hdr[0]), int(hdr[1]), docs,
                           float(hdr[2]) if hdr[2] is not None else None)
        if tag == ITERATOR:
            out = []
            while True:
                v = self.read_val()
                if v is END_OBJ:
                    return out
                out.append(v)
        if tag == END:
            return END_OBJ
        raise ValueError(f"unknown javabin tag {tag}")


def loads(data: bytes) -> Any:
    dec = _Decoder(data)
    version = dec._byte()
    if version != VERSION:
        raise ValueError(
            f"Invalid version (expected {VERSION}, but {version}) or the "
            f"data is not in 'javabin' format")
    return dec.read_val()
