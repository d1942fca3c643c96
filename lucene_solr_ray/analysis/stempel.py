"""Stempel — the Egothor algorithmic stemmer for Polish
(``lucene/analysis/stempel``): a reader for the serialized MultiTrie2
stemming table (``org/egothor/stemmer/{Trie,Row,MultiTrie,MultiTrie2}.
java`` store format) plus the patch-command interpreter
(``Diff.apply``) and the StempelFilter semantics (words shorter than
min_length pass through; a null/empty patch result keeps the original).

The table itself is the reference's own trained resource
(``pl/stemmer_20000.tbl``, Apache-2.0, embedded under analysis/data/ like
the stopword lists); goldens from TestPolishAnalyzer are pinned in
tests/test_stempel.py.
"""

from __future__ import annotations

import os
import struct

__all__ = ["StempelStemmer", "polish_stem"]

_EOM = "*"


class _JavaDataInput:
    """Big-endian java.io.DataInput over bytes (readBoolean/Int/Char/UTF;
    readUTF is modified UTF-8: 2-byte length, CESU-8-style encoding)."""

    __slots__ = ("b", "p")

    def __init__(self, b: bytes):
        self.b = b
        self.p = 0

    def boolean(self) -> bool:
        v = self.b[self.p] != 0
        self.p += 1
        return v

    def int32(self) -> int:
        v = struct.unpack_from(">i", self.b, self.p)[0]
        self.p += 4
        return v

    def char(self) -> str:
        v = struct.unpack_from(">H", self.b, self.p)[0]
        self.p += 2
        return chr(v)

    def utf(self) -> str:
        n = struct.unpack_from(">H", self.b, self.p)[0]
        self.p += 2
        raw = self.b[self.p:self.p + n]
        self.p += n
        # modified UTF-8: no 4-byte sequences, NUL as C0 80 — decode
        # manually so surrogate pairs survive as UTF-16 code units
        out = []
        i = 0
        while i < n:
            c = raw[i]
            if c < 0x80:
                out.append(chr(c))
                i += 1
            elif c >> 5 == 0b110:
                out.append(chr(((c & 0x1F) << 6) | (raw[i + 1] & 0x3F)))
                i += 2
            else:
                out.append(chr(((c & 0x0F) << 12)
                               | ((raw[i + 1] & 0x3F) << 6)
                               | (raw[i + 2] & 0x3F)))
                i += 3
        return "".join(out)


class _Row:
    __slots__ = ("cells",)

    def __init__(self, din: _JavaDataInput):
        cells = {}
        for _ in range(din.int32()):
            ch = din.char()
            cmd = din.int32()
            din.int32()          # cnt (unused at lookup time)
            ref = din.int32()
            din.int32()          # skip (unused)
            cells[ch] = (cmd, ref)
        self.cells = cells


class _Trie:
    __slots__ = ("forward", "root", "cmds", "rows")

    def __init__(self, din: _JavaDataInput):
        self.forward = din.boolean()
        self.root = din.int32()
        self.cmds = [din.utf() for _ in range(din.int32())]
        self.rows = [_Row(din) for _ in range(din.int32())]

    def get_last_on_path(self, key: str) -> str | None:
        # Trie.getLastOnPath (Trie.java:233-254)
        rows = self.rows
        if not (0 <= self.root < len(rows)):
            return None
        now = rows[self.root]
        last = None
        seq = key if self.forward else key[::-1]
        for i in range(len(key) - 1):
            ch = seq[i]
            cell = now.cells.get(ch)
            if cell is None:
                return last
            cmd, ref = cell
            if cmd >= 0:
                last = self.cmds[cmd]
            if ref >= 0 and ref < len(rows):
                now = rows[ref]
            else:
                return last
        cell = now.cells.get(seq[len(key) - 1]) if key else None
        if cell is not None and cell[0] >= 0:
            return self.cmds[cell[0]]
        return last


def _length_pp(cmd: str) -> int:
    # MultiTrie2.lengthPP: chars consumed by a patch command
    ln = 0
    i = 0
    while i < len(cmd):
        c = cmd[i]
        i += 1
        if c in "-D":
            ln += ord(cmd[i]) - ord("a") + 1
        elif c == "R":
            ln += 1
        # 'I' adds nothing
        i += 1
    return ln


class _MultiTrie2:
    __slots__ = ("forward", "by", "tries")

    def __init__(self, din: _JavaDataInput):
        self.forward = din.boolean()
        self.by = din.int32()
        self.tries = [_Trie(din) for _ in range(din.int32())]

    @staticmethod
    def _cannot_follow(after: str, goes: str) -> bool:
        return after in "-D" and after == goes

    def _skip(self, s: str, count: int) -> str:
        return s[count:] if self.forward else s[: len(s) - count]

    def get_last_on_path(self, key: str) -> str:
        # MultiTrie2.getLastOnPath (MultiTrie2.java:140-173)
        result: list[str] = []
        lastkey = key
        lastch = " "
        prev_cmd = None
        try:
            for trie in self.tries:
                r = trie.get_last_on_path(lastkey)
                if r is None or (len(r) == 1 and r[0] == _EOM):
                    return "".join(result)
                if self._cannot_follow(lastch, r[0]):
                    return "".join(result)
                lastch = r[-2]
                if r[0] == "-":
                    if prev_cmd is not None:
                        key = self._skip(key, _length_pp(prev_cmd))
                    key = self._skip(key, _length_pp(r))
                prev_cmd = r
                result.append(r)
                if key:
                    lastkey = key
        except IndexError:
            pass
        return "".join(result)


def diff_apply(dest: str, diff: str | None) -> str:
    """Diff.apply (Diff.java:106-150): in-place patch command execution
    over the word; silently stops on running off either end."""
    if not diff or not dest:
        return dest
    buf = list(dest)
    pos = len(buf) - 1
    try:
        for i in range(len(diff) // 2):
            cmd = diff[2 * i]
            param = diff[2 * i + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if not 0 <= pos < len(buf):
                    return "".join(buf)
                buf[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                if pos < 0 or o + 1 > len(buf):
                    return "".join(buf)
                del buf[pos:o + 1]
            elif cmd == "I":
                pos += 1
                if not 0 <= pos <= len(buf):
                    return "".join(buf)
                buf.insert(pos, param)
            pos -= 1
    except IndexError:
        pass
    return "".join(buf)


_DEFAULT_TABLE = os.path.join(
    os.path.dirname(__file__), "data", "polish_stemmer_20000.tbl")


class StempelStemmer:
    """StempelStemmer.java: table lookup + Diff patch. ``stem`` returns
    None when the table offers no command or patches down to nothing."""

    def __init__(self, table_path: str = _DEFAULT_TABLE):
        din = _JavaDataInput(open(table_path, "rb").read())
        method = din.utf().upper()
        if "M" in method:
            self.trie = _MultiTrie2(din)
        else:
            self.trie = _Trie(din)

    def stem(self, word: str) -> str | None:
        cmd = self.trie.get_last_on_path(word)
        if not cmd:
            return None
        out = diff_apply(word, cmd)
        return out if out else None


_STEMMER: StempelStemmer | None = None


def polish_stem(token: str, min_length: int = 3) -> str:
    """StempelFilter semantics (``stempel/StempelFilter.java``,
    DEFAULT_MIN_LENGTH=3): short words and words the table cannot stem
    pass through unchanged; the table is loaded once per process."""
    global _STEMMER
    if len(token) < min_length:
        return token
    if _STEMMER is None:
        _STEMMER = StempelStemmer()
    out = _STEMMER.stem(token)
    return out if out is not None else token
