"""From-spec zstd (RFC 8878) frame codec — decompressor and
compressor, pure Python, zero third-party dependencies.

``.jsonl.zst`` is the shard format large published LLM corpora (The
Pile, RedPajama, Dolma) actually distribute in, so a training-data
engine needs to READ it natively; this module implements the full
decode path from the public RFC: FSE (tANS) entropy coding including
the table-description bitstream, Huffman literals (direct and
FSE-compressed weight tables, 1- and 4-stream layouts, treeless
repeat blocks), the interleaved three-state sequence decoder with
repeat-offset history, raw/RLE blocks, multi-frame concatenation,
and the xxh64-based content checksum.  The compressor emits fully
valid frames (LZ77 hash-chain matcher -> predefined-FSE sequences +
Huffman or raw literals) so round-trip property tests and planted
corpus fixtures need no external tooling; interop in BOTH directions
against the reference ``zstd`` CLI is pinned by committed fixtures in
tests/data/zstd/ (see tests/test_round10_ops.py).

The three predefined sequence distributions below are the RFC 8878
§3.1.1.3.2.2 defaults; they were additionally verified byte-exact
against the int16 arrays compiled into the system libzstd 1.5.4.

Scale story (100 TB): a zstd FRAME is independently decodable — like
the one-gzip-member-per-record WARC layout (warc.py) and the
independently decodable LZ4 blocks, one frame per document/shard is
the record-level split grain; decoding runs inside Arrow map stages
(see ``plant_zstd_shards`` / ``zstd_corpus_stats``), so bytes never
leave the executor and the driver only sees small integer stats.

Reference analogue: none (the reference is a SysV-IPC graph server);
this belongs to the LLM-data-pipeline extension surface, wire-format
family (SURVEY.md §2.2 scans/sinks).
"""

from __future__ import annotations

from typing import Iterator

ZSTD_MAGIC = (0xFD2FB528).to_bytes(4, "little")
_SKIPPABLE_LO = 0x184D2A50
_BLOCK_MAX = 128 * 1024

# ----------------------------------------------------------------- xxh64

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl64(acc, 31) * _P1) & _M64


def _xxh64_merge(acc: int, val: int) -> int:
    acc ^= _xxh64_round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 per the public xxHash spec (zstd's content checksum is
    its low 32 bits).  Pinned to the published test vectors in
    tests/test_round10_ops.py."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _xxh64_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxh64_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xxh64_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xxh64_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        h = _xxh64_merge(h, v1)
        h = _xxh64_merge(h, v2)
        h = _xxh64_merge(h, v3)
        h = _xxh64_merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xxh64_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl64(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = ((_rotl64(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ------------------------------------------------------------ bit readers


class _FwdBits:
    """Forward little-endian bit reader (FSE table descriptions are
    the one forward-read bitstream in the format)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("zstd: FSE table description over-reads")
        v = 0
        p = self.bitpos
        for k in range(n):
            v |= ((self.data[(p + k) >> 3] >> ((p + k) & 7)) & 1) << k
        self.bitpos = end
        return v

    def peek16(self) -> int:
        byte = self.bitpos >> 3
        chunk = int.from_bytes(self.data[byte : byte + 3], "little")
        return (chunk >> (self.bitpos & 7)) & 0xFFFF

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) >> 3


class _BackBits:
    """Backward bitstream reader (RFC 8878 §3.1.1.5): written forward
    little-endian, terminated by a 1-sentinel bit, read back-to-front;
    ``read(n)`` returns the n bits below the cursor with the
    last-written bit as MSB."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ValueError("zstd: corrupt backward bitstream (no sentinel)")
        self.data = data
        self.pos = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def _bits(self, lo: int, n: int) -> int:
        """Bits [lo, lo+n) of the little-endian stream — O(1): only
        the covering bytes are materialized, never the whole stream."""
        b0 = lo >> 3
        nbytes = (n + (lo & 7) + 7) >> 3
        chunk = int.from_bytes(self.data[b0 : b0 + nbytes], "little")
        return (chunk >> (lo & 7)) & ((1 << n) - 1)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos < 0:
            raise ValueError("zstd: bitstream over-read")
        return self._bits(self.pos, n)

    def peek(self, n: int) -> int:
        """Zero-padded peek for Huffman table lookups near stream end."""
        if self.pos >= n:
            return self._bits(self.pos - n, n)
        return self._bits(0, self.pos) << (n - self.pos)

    def consume(self, n: int) -> None:
        self.pos -= n
        if self.pos < 0:
            raise ValueError("zstd: Huffman stream over-read")


# ------------------------------------------------------------------- FSE


def fse_read_ncount(data: bytes, max_symbol: int, max_acc: int = 9):
    """Parse an FSE table description (RFC 8878 §4.1.1): returns
    (normalized_counts, accuracy_log, bytes_consumed).  Counts may be
    -1 ('less than 1' probability)."""
    br = _FwdBits(data)
    acc = br.read(4) + 5
    if acc > max_acc:
        raise ValueError(f"zstd: accuracy_log {acc} exceeds max {max_acc}")
    remaining = (1 << acc) + 1
    threshold = 1 << acc
    nbits = acc + 1
    norm: list[int] = []
    prev_zero = False
    while remaining > 1 and len(norm) <= max_symbol:
        if prev_zero:
            # repeat-zero flags: 2-bit repeats, value 3 = continue
            while br.peek16() == 0xFFFF:
                br.read(16)
                norm.extend([0] * 24)
            while br.peek16() & 3 == 3:
                br.read(2)
                norm.extend([0] * 3)
            norm.extend([0] * br.read(2))
            if len(norm) > max_symbol:
                raise ValueError("zstd: FSE zero-run past max symbol")
            prev_zero = False
            continue
        maxv = (2 * threshold - 1) - remaining
        low = br.peek16() & (threshold - 1)
        if low < maxv:
            br.read(nbits - 1)
            count = low
        else:
            count = br.peek16() & (2 * threshold - 1)
            if count >= threshold:
                count -= maxv
            br.read(nbits)
        count -= 1  # now in [-1, ...]; 0 means zero-probability
        remaining -= -count if count < 0 else count
        norm.append(count)
        prev_zero = count == 0
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: FSE normalized counts do not sum to table size")
    norm.extend([0] * (max_symbol + 1 - len(norm)))
    return norm, acc, br.bytes_consumed()


def _fse_spread(norm: list[int], acc: int) -> list[int]:
    """Symbol-spread function shared by the decode- and encode-table
    builders (RFC 8878 §4.1.1 spread algorithm)."""
    size = 1 << acc
    table = [0] * size
    high = size - 1
    for s, c in enumerate(norm):
        if c == -1:
            table[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(norm):
        for _ in range(max(c, 0)):
            table[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE spread did not cycle back to 0")
    return table


def fse_build_dtable(norm: list[int], acc: int):
    """Decode table: per-state (symbol, nb_bits, baseline)."""
    size = 1 << acc
    spread = _fse_spread(norm, acc)
    next_state = [1 if c == -1 else c for c in norm]
    sym = [0] * size
    nbb = [0] * size
    base = [0] * size
    for i in range(size):
        s = spread[i]
        ns = next_state[s]
        next_state[s] += 1
        bits = acc - (ns.bit_length() - 1)
        sym[i] = s
        nbb[i] = bits
        base[i] = (ns << bits) - size
    return sym, nbb, base


class _FseDecoder:
    """One FSE state over a built decode table; RLE tables are
    modelled as acc=0 single-state tables (nb_bits always 0)."""

    __slots__ = ("sym", "nbb", "base", "acc", "state")

    def __init__(self, norm: list[int], acc: int) -> None:
        self.sym, self.nbb, self.base = fse_build_dtable(norm, acc)
        self.acc = acc
        self.state = 0

    @classmethod
    def rle(cls, symbol: int) -> "_FseDecoder":
        d = cls.__new__(cls)
        d.sym, d.nbb, d.base = [symbol], [0], [0]
        d.acc = 0
        d.state = 0
        return d

    def init(self, br: _BackBits) -> None:
        self.state = br.read(self.acc)

    def symbol(self) -> int:
        return self.sym[self.state]

    def update(self, br: _BackBits) -> None:
        self.state = self.base[self.state] + br.read(self.nbb[self.state])


def fse_build_ctable(norm: list[int], acc: int):
    """Encode table (FSE_buildCTable): state_table plus per-symbol
    (delta_nb_bits, delta_find_state)."""
    size = 1 << acc
    spread = _fse_spread(norm, acc)
    cumul = [0] * (len(norm) + 1)
    run = 0
    for s, c in enumerate(norm):
        cumul[s] = run
        run += 1 if c == -1 else max(c, 0)
    state_table = [0] * size
    for i in range(size):
        s = spread[i]
        state_table[cumul[s]] = size + i
        cumul[s] += 1
    delta_nb = [0] * len(norm)
    delta_fs = [0] * len(norm)
    total = 0
    for s, c in enumerate(norm):
        if c == 0:
            delta_nb[s] = ((acc + 1) << 16) - (1 << acc)
        elif c in (-1, 1):
            delta_nb[s] = (acc << 16) - (1 << acc)
            delta_fs[s] = total - 1
            total += 1
        else:
            max_bits_out = acc - ((c - 1).bit_length() - 1)  # acc - highbit(c-1)
            delta_nb[s] = (max_bits_out << 16) - (c << max_bits_out)
            delta_fs[s] = total - c
            total += c
    return state_table, delta_nb, delta_fs


class _BackBitWriter:
    """Forward little-endian writer for backward-read streams: append
    low-n bits of each value, close with a 1-sentinel."""

    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def add(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:  # keep the accumulator word-sized
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def close(self) -> bytes:
        self.acc |= 1 << self.n
        self.n += 1
        return bytes(self.out) + self.acc.to_bytes((self.n + 7) >> 3, "little")


class _FseEncoder:
    __slots__ = ("state_table", "delta_nb", "delta_fs", "acc", "state")

    def __init__(self, norm: list[int], acc: int) -> None:
        self.state_table, self.delta_nb, self.delta_fs = fse_build_ctable(norm, acc)
        self.acc = acc
        self.state = 0

    def init(self, symbol: int) -> None:
        nb_out = (self.delta_nb[symbol] + (1 << 15)) >> 16
        v = (nb_out << 16) - self.delta_nb[symbol]
        self.state = self.state_table[(v >> nb_out) + self.delta_fs[symbol]]

    def encode(self, bw: _BackBitWriter, symbol: int) -> None:
        nb_out = (self.state + self.delta_nb[symbol]) >> 16
        bw.add(self.state, nb_out)
        self.state = self.state_table[(self.state >> nb_out) + self.delta_fs[symbol]]

    def flush(self, bw: _BackBitWriter) -> None:
        bw.add(self.state, self.acc)


# ------------------------------------------------- predefined distributions

# RFC 8878 §3.1.1.3.2.2 default distributions, verified byte-exact
# against libzstd 1.5.4's compiled LL/OF/ML_defaultNorm arrays.
LL_DEFAULT_NORM = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                   2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                   -1, -1, -1, -1]
LL_DEFAULT_ACC = 6
OF_DEFAULT_NORM = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1]
OF_DEFAULT_ACC = 5
ML_DEFAULT_NORM = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
                   -1, -1, -1, -1, -1]
ML_DEFAULT_ACC = 6

LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                      13, 14, 15, 16]
LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                             256, 512, 1024, 2048, 4096, 8192, 16384,
                             32768, 65536]
ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                      12, 13, 14, 15, 16]
ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83,
                                99, 131, 259, 515, 1027, 2051, 4099, 8195,
                                16387, 32771, 65539]
MAX_LL_CODE = 35
MAX_ML_CODE = 52
MAX_OF_CODE = 31  # decoder bound; predefined table covers 0..28


def _seq_decoder(mode: int, data: bytes, pos: int, kind: str, prev):
    """Build one sequence-symbol decoder per its 2-bit compression
    mode; returns (decoder, new_pos).  ``prev`` is the previous
    decoder for Repeat_Mode (RFC: invalid in the first block)."""
    defaults = {
        "ll": (LL_DEFAULT_NORM, LL_DEFAULT_ACC, MAX_LL_CODE),
        "of": (OF_DEFAULT_NORM, OF_DEFAULT_ACC, MAX_OF_CODE),
        "ml": (ML_DEFAULT_NORM, ML_DEFAULT_ACC, MAX_ML_CODE),
    }
    norm, acc, max_sym = defaults[kind]
    if mode == 0:  # Predefined_Mode
        return _FseDecoder(norm, acc), pos
    if mode == 1:  # RLE_Mode
        if pos >= len(data):
            raise ValueError("zstd: truncated RLE sequence table")
        sym = data[pos]
        if sym > max_sym:
            raise ValueError(f"zstd: RLE {kind} symbol {sym} out of range")
        return _FseDecoder.rle(sym), pos + 1
    if mode == 2:  # FSE_Compressed_Mode
        max_acc = {"ll": 9, "of": 8, "ml": 9}[kind]
        got, got_acc, used = fse_read_ncount(data[pos:], max_sym, max_acc)
        return _FseDecoder(got, got_acc), pos + used
    if prev is None:  # Repeat_Mode without a prior table
        raise ValueError(f"zstd: Repeat_Mode {kind} table with no previous table")
    prev.state = 0
    return prev, pos


# ---------------------------------------------------------------- Huffman


def huf_read_weights(data: bytes):
    """Huffman tree description (RFC 8878 §4.2.1): returns
    (weights_including_deduced_last, table_log, bytes_consumed)."""
    if not data:
        raise ValueError("zstd: empty Huffman tree description")
    header = data[0]
    if header >= 128:  # direct 4-bit weights
        n = header - 127
        nbytes = (n + 1) // 2
        if len(data) < 1 + nbytes:
            raise ValueError("zstd: truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        used = 1 + nbytes
    else:  # FSE-compressed weights, two interleaved states
        csize = header
        if len(data) < 1 + csize:
            raise ValueError("zstd: truncated FSE Huffman weights")
        payload = data[1 : 1 + csize]
        norm, acc, hdr = fse_read_ncount(payload, 255, 6)
        dec1 = _FseDecoder(norm, acc)
        dec2 = _FseDecoder(norm, acc)
        br = _BackBits(payload[hdr:])
        dec1.init(br)
        dec2.init(br)
        weights = []
        while True:
            weights.append(dec1.symbol())
            if br.pos < dec1.nbb[dec1.state]:
                weights.append(dec2.symbol())
                break
            dec1.update(br)
            weights.append(dec2.symbol())
            if br.pos < dec2.nbb[dec2.state]:
                weights.append(dec1.symbol())
                break
            dec2.update(br)
            if len(weights) > 255:
                raise ValueError("zstd: runaway Huffman weight stream")
        used = 1 + csize
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: all-zero Huffman weights")
    table_log = total.bit_length()  # highbit(total) + 1
    if table_log > 11:
        raise ValueError("zstd: Huffman table log exceeds 11")
    rest = (1 << table_log) - total
    if rest & (rest - 1):
        raise ValueError("zstd: Huffman weights not completable to a power of 2")
    weights.append(rest.bit_length())  # deduced last weight
    return weights, table_log, used


def huf_build_dtable(weights: list[int], table_log: int):
    """Canonical decode table of size 2^table_log: cell -> (symbol,
    nb_bits); cells filled weight-ascending, symbol-ascending (the
    huf0 canonical order)."""
    size = 1 << table_log
    rank_count = [0] * (table_log + 2)
    for w in weights:
        rank_count[w] += 1
    rank_start = [0] * (table_log + 2)
    run = 0
    for w in range(1, table_log + 2):
        rank_start[w] = run
        run += rank_count[w] << (w - 1)
    if run != size:
        raise ValueError("zstd: Huffman weights do not fill the table")
    table = [(0, 0)] * size
    for s, w in enumerate(weights):
        if w == 0:
            continue
        length = table_log + 1 - w
        start = rank_start[w]
        for i in range(1 << (w - 1)):
            table[start + i] = (s, length)
        rank_start[w] += 1 << (w - 1)
    return table


def _huf_decode_stream(table, table_log: int, data: bytes, n_syms: int) -> bytearray:
    br = _BackBits(data)
    out = bytearray()
    for _ in range(n_syms):
        sym, length = table[br.peek(table_log)]
        br.consume(length)
        out.append(sym)
    if br.pos != 0:
        raise ValueError("zstd: Huffman stream not fully consumed")
    return out


def _decode_literals(block: bytes, pos: int, prev_table):
    """Literals section: returns (literals, new_pos, huffman_table)
    where huffman_table persists across blocks for Treeless mode."""
    if pos >= len(block):
        raise ValueError("zstd: missing literals section")
    b0 = block[pos]
    ltype = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if size_fmt in (0, 2):  # 1-byte header, 5-bit size
            size = b0 >> 3
            pos += 1
        elif size_fmt == 1:
            size = (b0 >> 4) + (block[pos + 1] << 4)
            pos += 2
        else:
            size = (b0 >> 4) + (block[pos + 1] << 4) + (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            lits = block[pos : pos + size]
            if len(lits) != size:
                raise ValueError("zstd: truncated raw literals")
            return bytes(lits), pos + size, prev_table
        if pos >= len(block):
            raise ValueError("zstd: truncated RLE literals")
        return bytes([block[pos]]) * size, pos + 1, prev_table
    # Compressed (2) / Treeless (3)
    if size_fmt == 0:
        n_streams = 1
        regen = (b0 >> 4) + ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) + (block[pos + 2] << 2)
        pos += 3
    elif size_fmt == 1:
        n_streams = 4
        regen = (b0 >> 4) + ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) + (block[pos + 2] << 2)
        pos += 3
    elif size_fmt == 2:
        n_streams = 4
        regen = (b0 >> 4) + (block[pos + 1] << 4) + ((block[pos + 2] & 3) << 12)
        comp = (block[pos + 2] >> 2) + (block[pos + 3] << 6)
        pos += 4
    else:
        n_streams = 4
        regen = (b0 >> 4) + (block[pos + 1] << 4) + ((block[pos + 2] & 0x3F) << 12)
        comp = (block[pos + 2] >> 6) + (block[pos + 3] << 2) + (block[pos + 4] << 10)
        pos += 5
    section = block[pos : pos + comp]
    if len(section) != comp:
        raise ValueError("zstd: truncated compressed literals")
    pos += comp
    if ltype == 2:
        weights, table_log, used = huf_read_weights(section)
        table = (huf_build_dtable(weights, table_log), table_log)
        section = section[used:]
    else:
        if prev_table is None:
            raise ValueError("zstd: treeless literals with no previous table")
        table = prev_table
    dtable, table_log = table
    if n_streams == 1:
        lits = _huf_decode_stream(dtable, table_log, section, regen)
    else:
        if len(section) < 6:
            raise ValueError("zstd: missing 4-stream jump table")
        s1 = int.from_bytes(section[0:2], "little")
        s2 = int.from_bytes(section[2:4], "little")
        s3 = int.from_bytes(section[4:6], "little")
        body = section[6:]
        if s1 + s2 + s3 > len(body):
            raise ValueError("zstd: 4-stream sizes exceed section")
        per = (regen + 3) >> 2
        last = regen - 3 * per
        if last < 0:
            raise ValueError("zstd: 4-stream regenerated size too small")
        cuts = [
            (body[:s1], per),
            (body[s1 : s1 + s2], per),
            (body[s1 + s2 : s1 + s2 + s3], per),
            (body[s1 + s2 + s3 :], last),
        ]
        lits = bytearray()
        for chunk, count in cuts:
            lits += _huf_decode_stream(dtable, table_log, chunk, count)
    if len(lits) != regen:
        raise ValueError("zstd: literal count mismatch")
    return bytes(lits), pos, table


# ------------------------------------------------------------- block/frame


def _decode_block(block: bytes, out: bytearray, state: dict) -> None:
    """Decode one Compressed_Block into ``out`` (which already holds
    the frame's earlier output — the match window).  ``state`` holds
    cross-block frame state: huffman table, FSE tables, rep offsets."""
    lits, pos, state["huf"] = _decode_literals(block, pos=0, prev_table=state["huf"])
    if pos >= len(block):
        raise ValueError("zstd: missing sequences section")
    b0 = block[pos]
    if b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) + block[pos + 1]
        pos += 2
    else:
        n_seq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    if n_seq == 0:
        out += lits
        return
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence-mode bits set")
    ll_dec, pos = _seq_decoder((modes >> 6) & 3, block, pos, "ll", state["ll"])
    of_dec, pos = _seq_decoder((modes >> 4) & 3, block, pos, "of", state["of"])
    ml_dec, pos = _seq_decoder((modes >> 2) & 3, block, pos, "ml", state["ml"])
    state["ll"], state["of"], state["ml"] = ll_dec, of_dec, ml_dec
    br = _BackBits(block[pos:])
    ll_dec.init(br)
    of_dec.init(br)
    ml_dec.init(br)
    rep = state["rep"]
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_dec.symbol()
        ml_code = ml_dec.symbol()
        ll_code = ll_dec.symbol()
        if of_code > MAX_OF_CODE or ml_code > MAX_ML_CODE or ll_code > MAX_LL_CODE:
            raise ValueError("zstd: sequence code out of range")
        offset_value = (1 << of_code) + br.read(of_code)
        match_len = ML_BASE[ml_code] + br.read(ML_BITS[ml_code])
        lit_len = LL_BASE[ll_code] + br.read(LL_BITS[ll_code])
        if i != n_seq - 1:
            ll_dec.update(br)
            ml_dec.update(br)
            of_dec.update(br)
        # repeat-offset resolution (RFC 8878 §3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            rep[2], rep[1], rep[0] = rep[1], rep[0], offset
        else:
            idx = offset_value - 1 if lit_len != 0 else offset_value
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # lit_len == 0 and offset_value == 3
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: repeat offset underflow")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if lit_pos + lit_len > len(lits):
            raise ValueError("zstd: sequence literals overrun")
        out += lits[lit_pos : lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out):
            raise ValueError("zstd: match offset beyond window")
        if offset >= match_len:
            start = len(out) - offset
            out += out[start : start + match_len]
        else:
            for _ in range(match_len):  # overlapping copy, byte-wise
                out.append(out[len(out) - offset])
    if br.pos != 0:
        raise ValueError("zstd: sequence bitstream not fully consumed")
    out += lits[lit_pos:]


_DICT_MAGIC = (0xEC30A437).to_bytes(4, "little")


class ZstdDictionary:
    """Parsed RFC 8878 §5 dictionary: the ID the frame header must
    match, the entropy tables that preload Repeat/Treeless modes for
    the frame's FIRST block, the three initial recent offsets, and
    the content bytes that act as the window's virtual past."""

    __slots__ = (
        "dict_id", "huf", "ll_norm", "ll_acc", "of_norm", "of_acc",
        "ml_norm", "ml_acc", "rep", "content",
    )


def zstd_parse_dictionary(data: bytes) -> ZstdDictionary:
    """Parse a structured zstd dictionary (the ``zstd --train`` /
    zdict output format, RFC 8878 §5): magic 0xEC30A437, 4-byte LE
    dictionary ID, entropy tables in the block wire format (Huffman
    literals table, then FSE offsets / match-lengths / literal-lengths
    tables), 3x4-byte LE initial recent offsets (each nonzero and
    <= content size), then the raw content."""
    if data[:4] != _DICT_MAGIC:
        raise ValueError("zstd: bad dictionary magic")
    d = ZstdDictionary()
    d.dict_id = int.from_bytes(data[4:8], "little")
    pos = 8
    weights, table_log, used = huf_read_weights(data[pos:])
    d.huf = (huf_build_dtable(weights, table_log), table_log)
    pos += used
    d.of_norm, d.of_acc, used = fse_read_ncount(data[pos:], MAX_OF_CODE, 8)
    pos += used
    d.ml_norm, d.ml_acc, used = fse_read_ncount(data[pos:], MAX_ML_CODE, 9)
    pos += used
    d.ll_norm, d.ll_acc, used = fse_read_ncount(data[pos:], MAX_LL_CODE, 9)
    pos += used
    if pos + 12 > len(data):
        raise ValueError("zstd: truncated dictionary offset history")
    rep = [
        int.from_bytes(data[pos + 4 * i : pos + 4 * i + 4], "little")
        for i in range(3)
    ]
    pos += 12
    d.content = bytes(data[pos:])
    for r in rep:
        if r == 0 or r > len(d.content):
            raise ValueError("zstd: dictionary recent offset out of range")
    d.rep = rep
    return d


def zstd_decompress(
    data: bytes,
    max_size: int = 1 << 26,
    *,
    dictionary: ZstdDictionary | None = None,
) -> bytes:
    """Decompress a zstd stream: one or more concatenated frames
    (skippable frames are skipped), each validated end-to-end —
    magic, reserved bits, block sizes, sequence/bitstream exactness,
    frame-content size, and the xxh64-low32 content checksum when
    present.  A frame carrying a Dictionary_ID requires ``dictionary``
    (round 12): the ID must match, the dictionary's entropy tables
    preload Treeless/Repeat modes for the first block, its recent
    offsets replace {1,4,8}, and its content seeds the match window
    as virtual past (never emitted).  Frames without a DID ignore
    ``dictionary`` entirely, per the RFC."""
    out = bytearray()
    pos = 0
    n = len(data)
    if n == 0:
        raise ValueError("zstd: empty input")
    while pos < n:
        magic = int.from_bytes(data[pos : pos + 4], "little")
        if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
            if pos + 8 > n:
                raise ValueError("zstd: truncated skippable frame")
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            if pos + 8 + size > n:
                raise ValueError("zstd: truncated skippable frame")
            pos += 8 + size
            continue
        if data[pos : pos + 4] != ZSTD_MAGIC:
            raise ValueError("zstd: bad magic number")
        pos += 4
        if pos >= n:
            raise ValueError("zstd: truncated frame header")
        fhd = data[pos]
        pos += 1
        if fhd & 0x08:
            raise ValueError("zstd: reserved frame-header bit set")
        single_segment = bool(fhd & 0x20)
        checksum = bool(fhd & 0x04)
        did_code = fhd & 3
        fcs_code = fhd >> 6
        if not single_segment:
            pos += 1  # window descriptor (full buffer kept; no clamp)
        frame_dict = None
        if did_code:
            did_len = (0, 1, 2, 4)[did_code]
            if pos + did_len > n:
                raise ValueError("zstd: truncated dictionary ID")
            did = int.from_bytes(data[pos : pos + did_len], "little")
            pos += did_len
            if dictionary is None:
                raise ValueError(
                    f"zstd: frame requires dictionary {did} (pass dictionary=)"
                )
            if dictionary.dict_id != did:
                raise ValueError(
                    f"zstd: dictionary ID mismatch (frame {did}, "
                    f"dictionary {dictionary.dict_id})"
                )
            frame_dict = dictionary
        fcs = None
        fcs_len = (0, 2, 4, 8)[fcs_code] if not (fcs_code == 0 and single_segment) else 1
        if pos + fcs_len > n:
            raise ValueError("zstd: truncated frame header")
        if fcs_code == 0:
            if single_segment:
                fcs = data[pos]
                pos += 1
        elif fcs_code == 1:
            fcs = int.from_bytes(data[pos : pos + 2], "little") + 256
            pos += 2
        elif fcs_code == 2:
            fcs = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        else:
            fcs = int.from_bytes(data[pos : pos + 8], "little")
            pos += 8
        # Dictionary frames decode into their own buffer seeded with
        # the dict content (the window's virtual past — matches may
        # copy from it, output excludes it); plain frames keep the
        # shared buffer.
        if frame_dict is not None:
            fbuf = bytearray(frame_dict.content)
            state = {
                "huf": frame_dict.huf,
                "ll": _FseDecoder(frame_dict.ll_norm, frame_dict.ll_acc),
                "of": _FseDecoder(frame_dict.of_norm, frame_dict.of_acc),
                "ml": _FseDecoder(frame_dict.ml_norm, frame_dict.ml_acc),
                "rep": list(frame_dict.rep),
            }
        else:
            fbuf = out
            state = {"huf": None, "ll": None, "of": None, "ml": None, "rep": [1, 4, 8]}
        frame_start = len(fbuf)
        while True:
            if pos + 3 > n:
                raise ValueError("zstd: truncated block header")
            hdr = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = hdr & 1
            btype = (hdr >> 1) & 3
            bsize = hdr >> 3
            if btype == 3:
                raise ValueError("zstd: reserved block type")
            if bsize > _BLOCK_MAX:
                # RFC 8878 §3.1.1.2.3: Block_Size <= Block_Maximum_Size
                # for EVERY block type — RLE's 21-bit regenerated size
                # must be bounded too, not just raw/compressed payloads.
                raise ValueError("zstd: block exceeds maximum size")
            if btype == 1:  # RLE
                if pos >= n:
                    raise ValueError("zstd: truncated RLE block")
                fbuf += bytes([data[pos]]) * bsize
                pos += 1
            else:
                block = data[pos : pos + bsize]
                if len(block) != bsize:
                    raise ValueError("zstd: truncated block")
                pos += bsize
                if btype == 0:
                    fbuf += block
                else:
                    try:
                        _decode_block(block, fbuf, state)
                    except IndexError as exc:  # malformed block structure
                        raise ValueError("zstd: truncated block structure") from exc
            if len(fbuf) - frame_start > max_size:
                raise ValueError("zstd: output exceeds max_size")
            if last:
                break
        if fcs is not None and len(fbuf) - frame_start != fcs:
            raise ValueError("zstd: frame content size mismatch")
        if checksum:
            if pos + 4 > n:
                raise ValueError("zstd: truncated content checksum")
            want = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            if xxh64(bytes(fbuf[frame_start:])) & 0xFFFFFFFF != want:
                raise ValueError("zstd: content checksum mismatch")
        if frame_dict is not None:
            out += fbuf[frame_start:]
    return bytes(out)


# -------------------------------------------------------------- compressor


def _huf_lengths(freqs: dict[int, int]) -> dict[int, int] | None:
    """Huffman code lengths from frequencies, or None when Huffman
    literals are not worth it / not representable in the simple
    direct-weight table this writer emits (depth > 11 or a symbol
    value > 127 — the legal fallback is raw literals)."""
    import heapq

    if len(freqs) < 2 or max(freqs) > 127:
        return None
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    tick = len(heap)
    depth = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, g1 + g2))
        tick += 1
    if max(depth.values()) > 11:
        return None
    return depth


def _huf_canonical_codes(weights: list[int], table_log: int) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nb_bits) matching the decoder's canonical
    fill: weight-ascending cell allocation, symbols ascending within a
    weight; code = cell_start >> (w-1)."""
    order = sorted(
        (w, s) for s, w in enumerate(weights) if w > 0
    )  # weight asc, symbol asc
    codes = {}
    pos = 0
    for w, s in order:
        codes[s] = (pos >> (w - 1), table_log + 1 - w)
        pos += 1 << (w - 1)
    return codes


def _huf_compress_literals(lits: bytes) -> bytes | None:
    """Compressed_Literals_Block with a direct-weight tree
    description; 1-stream for <=1023 literals, 4-stream (Size_Format
    11, 18-bit fields) beyond.  Returns None when Huffman does not
    shrink (caller falls back to raw literals)."""
    freqs: dict[int, int] = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    depth = _huf_lengths(freqs)
    if depth is None:
        return None
    table_log = max(depth.values())
    max_sym = max(depth)
    # weight = table_log + 1 - nb_bits; weights for 0..max_sym-1 are
    # transmitted, the last one is deduced by the decoder
    weights = [0] * (max_sym + 1)
    for s, d in depth.items():
        weights[s] = table_log + 1 - d
    n_transmitted = max_sym  # symbols 0..max_sym-1
    if n_transmitted > 128:
        return None
    tree = bytearray([127 + n_transmitted])
    for i in range(0, n_transmitted, 2):
        hi = weights[i] << 4
        lo = weights[i + 1] if i + 1 < n_transmitted else 0
        tree.append(hi | lo)
    codes = _huf_canonical_codes(weights, table_log)

    def enc_stream(chunk: bytes) -> bytes:
        bw = _BackBitWriter()
        for b in reversed(chunk):  # last-written decodes first
            code, nbits = codes[b]
            bw.add(code, nbits)
        return bw.close()

    regen = len(lits)
    if regen <= 1023:
        body = bytes(tree) + enc_stream(lits)
        comp = len(body)
        if comp > 1023:
            return None
        h = regen | (comp << 10)  # type=2, size_format=00 -> bits 0..3 = 0b0010
        header = bytes([2 | ((h & 0x0F) << 4), (h >> 4) & 0xFF, (h >> 12) & 0xFF])
        out = header + body
    else:
        per = (regen + 3) >> 2
        parts = [lits[0:per], lits[per : 2 * per], lits[2 * per : 3 * per], lits[3 * per :]]
        streams = [enc_stream(p) for p in parts]
        jump = b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
        if any(len(s) > 0xFFFF for s in streams[:3]):
            return None
        body = bytes(tree) + jump + b"".join(streams)
        comp = len(body)
        if regen >= 1 << 18 or comp >= 1 << 18:
            return None
        # type=2, size_format=11: 5-byte header, 18-bit regen + comp
        header = bytes(
            [
                2 | (3 << 2) | ((regen & 0x0F) << 4),
                (regen >> 4) & 0xFF,
                ((regen >> 12) & 0x3F) | ((comp & 3) << 6),
                (comp >> 2) & 0xFF,
                (comp >> 10) & 0xFF,
            ]
        )
        out = header + body
    return out if len(out) < regen + 3 else None


def _raw_literals(lits: bytes) -> bytes:
    n = len(lits)
    if n <= 31:
        return bytes([(n << 3) | 0]) + lits  # size_format 00, 5-bit
    if n <= 4095:
        return bytes([((n & 0x0F) << 4) | 0x04, n >> 4]) + lits  # 01, 12-bit
    return bytes([((n & 0x0F) << 4) | 0x0C, (n >> 4) & 0xFF, n >> 12]) + lits


def _ll_code(v: int) -> int:
    if v < 16:
        return v
    import bisect

    return bisect.bisect_right(LL_BASE, v) - 1


def _ml_code(v: int) -> int:
    if v < 35:
        return v - 3
    import bisect

    return bisect.bisect_right(ML_BASE, v) - 1


def _find_sequences(data: bytes, prefix: bytes = b""):
    """Greedy LZ77 over one block: hash-table match finder (4-byte
    keys, min match 3 via 4), returns (sequences, tail_literals) where
    each sequence is (lit_len, offset, match_len) over ``data``.
    ``prefix`` (round 12, dictionary compression) is searchable
    virtual past: matches may START in it (offsets reach beyond the
    block's own output, into the dictionary content the decoder seeds
    its window with) and extend forward across the boundary, but only
    ``data`` positions emit sequences."""
    comb = prefix + data if prefix else data
    base = len(prefix)
    n = len(comb)
    table: dict[bytes, int] = {}
    for p in range(max(0, n - len(data) - 3)):  # seed prefix positions
        table[comb[p : p + 4]] = p
    seqs = []
    anchor = base
    i = base
    while i + 4 <= n:
        key = comb[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and comb[cand : cand + 4] == key:
            mlen = 4
            while i + mlen < n and comb[cand + mlen] == comb[i + mlen]:
                mlen += 1
            seqs.append((i - anchor, i - cand, mlen))
            for j in range(i + 1, min(i + mlen, n - 3)):
                table[comb[j : j + 4]] = j
            i += mlen
            anchor = i
        else:
            i += 1
    return seqs, comb[anchor:]


def _encode_sequences(seqs, lits_tail_unused=None) -> bytes:
    """Sequences_Section with all three tables in Predefined_Mode:
    count header, mode byte 0, then the interleaved backward FSE
    bitstream (write order per the format's read order reversed:
    states init from the LAST sequence; extra-bits LL,ML,OF; then per
    earlier sequence encode OF,ML,LL states + add LL,ML,OF extras;
    flush ML,OF,LL)."""
    n = len(seqs)
    if n < 128:
        hdr = bytes([n])
    elif n < 0x7F00:
        hdr = bytes([128 + (n >> 8), n & 0xFF])
    else:
        hdr = bytes([255, n & 0xFF, (n - 0x7F00) >> 8])
    ll_enc = _FseEncoder(LL_DEFAULT_NORM, LL_DEFAULT_ACC)
    of_enc = _FseEncoder(OF_DEFAULT_NORM, OF_DEFAULT_ACC)
    ml_enc = _FseEncoder(ML_DEFAULT_NORM, ML_DEFAULT_ACC)

    def codes(seq):
        ll, off, ml = seq
        ofv = off + 3
        return (
            _ll_code(ll),
            ofv.bit_length() - 1,
            _ml_code(ml),
        )

    bw = _BackBitWriter()
    ll, off, ml = seqs[-1]
    llc, ofc, mlc = codes(seqs[-1])
    ml_enc.init(mlc)
    of_enc.init(ofc)
    ll_enc.init(llc)
    bw.add(ll - LL_BASE[llc], LL_BITS[llc])
    bw.add(ml - ML_BASE[mlc], ML_BITS[mlc])
    bw.add((off + 3) - (1 << ofc), ofc)
    for seq in reversed(seqs[:-1]):
        ll, off, ml = seq
        llc, ofc, mlc = codes(seq)
        of_enc.encode(bw, ofc)
        ml_enc.encode(bw, mlc)
        ll_enc.encode(bw, llc)
        bw.add(ll - LL_BASE[llc], LL_BITS[llc])
        bw.add(ml - ML_BASE[mlc], ML_BITS[mlc])
        bw.add((off + 3) - (1 << ofc), ofc)
    ml_enc.flush(bw)
    of_enc.flush(bw)
    ll_enc.flush(bw)
    return hdr + b"\x00" + bw.close()


def _compress_block(chunk: bytes, prefix: bytes = b"") -> bytes | None:
    """One Compressed_Block body, or None when it would not shrink."""
    seqs, tail = _find_sequences(chunk, prefix)
    if not seqs:
        lits = chunk
        body_seq = b"\x00"  # nbSeq = 0
    else:
        parts = []
        pos = 0
        for ll, _off, ml in seqs:
            parts.append(chunk[pos : pos + ll])
            pos += ll + ml
        parts.append(tail)
        lits = b"".join(parts)
        body_seq = _encode_sequences(seqs)
    lit_sec = _huf_compress_literals(lits) or _raw_literals(lits)
    body = lit_sec + body_seq
    return body if len(body) < len(chunk) else None


def _window_descriptor(need: int) -> int:
    """Smallest RFC 8878 §3.1.1.1.2 Window_Descriptor byte whose
    window size covers ``need`` bytes: upper 5 bits exponent
    (windowLog = 10 + exp), lower 3 bits mantissa (size = base +
    base/8 * mantissa)."""
    for exp in range(0, 32):
        base = 1 << (10 + exp)
        for man in range(8):
            if base + (base // 8) * man >= need:
                return (exp << 3) | man
    raise ValueError("zstd: window size out of range")


def zstd_compress(
    data: bytes,
    *,
    block_size: int = 1 << 17,
    checksum: bool = True,
    dictionary: ZstdDictionary | None = None,
) -> bytes:
    """Single-frame zstd writer: single-segment header with exact
    frame-content size, 128 KB blocks (Compressed with predefined-FSE
    sequences + Huffman/raw literals; Raw or RLE when entropy does not
    pay), optional xxh64-low32 content checksum.  Output decodes with
    both this module's decoder and the reference zstd CLI (pinned in
    tests).

    With ``dictionary`` (round 12): the frame carries the 4-byte
    Dictionary_ID and a Window_Descriptor sized to cover dictionary
    content + payload (matches reach into the dictionary's virtual
    past, so the window must span both — single-segment windows equal
    FCS and could not), and the FIRST block's match finder searches
    the dictionary content as prefix.  The encoder never emits
    Repeat/Treeless modes, so the dictionary's entropy tables impose
    nothing on the write path — exactly the liberty the RFC grants."""
    if block_size > _BLOCK_MAX:
        raise ValueError("zstd: block_size above format maximum")
    n = len(data)
    out = bytearray(ZSTD_MAGIC)
    if dictionary is None:
        # FHD: single-segment + checksum + FCS code by size
        if n <= 255:
            fhd = 0x20 | (0 << 6)
            fcs = bytes([n])
        elif n <= 65535 + 256:
            fhd = 0x20 | (1 << 6)
            fcs = (n - 256).to_bytes(2, "little")
        elif n < 1 << 32:
            fhd = 0x20 | (2 << 6)
            fcs = n.to_bytes(4, "little")
        else:
            fhd = 0x20 | (3 << 6)
            fcs = n.to_bytes(8, "little")
        if checksum:
            fhd |= 0x04
        out.append(fhd)
        out += fcs
    else:
        if 256 <= n <= 65535 + 256:
            fcs_code, fcs = 1, (n - 256).to_bytes(2, "little")
        elif n < 1 << 32:
            fcs_code, fcs = 2, n.to_bytes(4, "little")
        else:
            fcs_code, fcs = 3, n.to_bytes(8, "little")
        fhd = (fcs_code << 6) | 3  # did_code 3: 4-byte dictionary ID
        if checksum:
            fhd |= 0x04
        out.append(fhd)
        out.append(_window_descriptor(len(dictionary.content) + n))
        out += dictionary.dict_id.to_bytes(4, "little")
        out += fcs
    nblocks = max(1, -(-n // block_size))
    for bi in range(nblocks):
        chunk = data[bi * block_size : (bi + 1) * block_size]
        last = 1 if bi == nblocks - 1 else 0
        if chunk and chunk.count(chunk[0]) == len(chunk):
            out += ((len(chunk) << 3) | (1 << 1) | last).to_bytes(3, "little")
            out.append(chunk[0])
            continue
        prefix = dictionary.content if (dictionary is not None and bi == 0) else b""
        body = _compress_block(chunk, prefix) if len(chunk) >= 16 else None
        if body is None:
            out += ((len(chunk) << 3) | (0 << 1) | last).to_bytes(3, "little")
            out += chunk
        else:
            out += ((len(body) << 3) | (2 << 1) | last).to_bytes(3, "little")
            out += body
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


# ------------------------------------------------------------ Spark surface

# Shared-dictionary corpus template (round 12): every q_zstd_dict
# shard is this fixed preamble + a short unique tail, the layout
# shared-dict corpora use (tiny records, common boilerplate — the
# exact case RFC 8878 dictionaries exist for).  The committed
# dictionary (data/zstd_shared.dict, trained by `zstd --train` over
# this distribution; recipe in scripts/gen_zstd_fixtures.py) carries
# the template in its content, so compressed shards genuinely
# reference the dictionary window — decoding with the wrong dict
# fails the frame checksum, with no dict fails the DID gate.
ZSTD_DICT_TEMPLATE = (
    "shared corpus preamble: the quick brown fox jumps over the lazy dog; "
    "pack my box with five dozen liquor jugs; how vexingly quick daft "
    "zebras jump; sphinx of black quartz judge my vow; jackdaws love my "
    "big sphinx of quartz; the five boxing wizards jump quickly -- "
)

_SHARED_DICT_CACHE: list = []


def shared_dictionary() -> "ZstdDictionary":
    """The committed trained dictionary, parsed once per process.
    Local mode reads it off the shared filesystem; on a real cluster
    the file ships with the package (it lives in package data), so
    executors resolve the same relative path."""
    if not _SHARED_DICT_CACHE:
        import os

        path = os.path.join(os.path.dirname(__file__), "data", "zstd_shared.dict")
        with open(path, "rb") as fh:
            _SHARED_DICT_CACHE.append(zstd_parse_dictionary(fh.read()))
    return _SHARED_DICT_CACHE[0]


def plant_zstd_dict_shards(documents, *, id_col: str = "doc_id"):
    """Planted shared-dictionary .zst shards: file ``id`` is the
    dictionary-frame compression (4-byte DID + window descriptor
    spanning dict content + payload; first-block matches reach into
    the dictionary) of ``ZSTD_DICT_TEMPLATE + 'doc {id} tail
    {(id*id) % 9973}\\n'``.  The dictionary turns the ~260-byte
    template into one match (~3 bytes of sequence), so the dict frame
    is a fraction of the plain frame — the measured point of shared
    dictionaries on boilerplate-heavy small records."""
    import pandas as pd

    from ..operators.multimodal import _spread
    from .warc import WARC_FILE_SCHEMA

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        d = shared_dictionary()
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                text = f"{ZSTD_DICT_TEMPLATE}doc {i} tail {(i * i) % 9973}\n".encode()
                ids.append(i)
                payloads.append(zstd_compress(text, dictionary=d))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["zstd-dict"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return _spread(documents.select(id_col)).mapInPandas(build, schema=WARC_FILE_SCHEMA)


def zstd_dict_corpus_stats(media):
    """``zstd_corpus_stats`` for dictionary frames: each record's DID
    is gated against the shared dictionary inside the decode, the
    dictionary content seeds the match window, and the frame checksum
    verifies the reconstruction end-to-end — the 'c' count then
    value-checks the bytes against the closed-form oracle."""
    import pandas as pd

    from .warc import LZ4_STATS_SCHEMA

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        d = shared_dictionary()
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "n_bytes", "n_lines", "c_count")}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                raw = zstd_decompress(bytes(payload), dictionary=d)
                rows["media_id"].append(int(mid))
                rows["n_bytes"].append(len(raw))
                rows["n_lines"].append(raw.count(b"\n"))
                rows["c_count"].append(raw.count(b"c"))
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, schema=LZ4_STATS_SCHEMA)


def plant_zstd_shards(documents, *, id_col: str = "doc_id"):
    """Planted .zst text shards: file ``id`` is the zstd-frame
    compression (this module's own writer: Huffman literals +
    predefined-FSE sequences + xxh64 content checksum) of
    ``m = 20 + id % 30`` lines ``'doc {id} line {l}\\n'`` — the same
    closed-form corpus the LZ4 shards use, so decompressed byte/line/
    char counts replay in SQL and the two wire formats are directly
    comparable.  CLI interop for foreign frames is pinned separately
    in tests/data/zstd/."""
    import pandas as pd

    from ..operators.multimodal import _spread
    from .warc import WARC_FILE_SCHEMA

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                m = 20 + i % 30
                text = "".join(f"doc {i} line {l}\n" for l in range(m)).encode()
                ids.append(i)
                payloads.append(zstd_compress(text))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": ["zstd"] * len(ids),
                    "media": payloads,
                    "source": ["planted"] * len(ids),
                }
            )

    return _spread(documents.select(id_col)).mapInPandas(build, schema=WARC_FILE_SCHEMA)


def zstd_corpus_stats(media):
    """Decompress .zst shards in one Arrow map stage and emit exact
    integers over the INFLATED text (bytes, lines, 'c' count): the
    character count value-checks the reconstructed bytes (a garbage
    inflater that only got sizes right fails), and the frame's own
    xxh64 content checksum is verified inside ``zstd_decompress``.
    Scale: one frame per record = the record-level split grain;
    compressed bytes never leave the stage."""
    import pandas as pd

    from .warc import LZ4_STATS_SCHEMA

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "n_bytes", "n_lines", "c_count")}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                raw = zstd_decompress(bytes(payload))
                rows["media_id"].append(int(mid))
                rows["n_bytes"].append(len(raw))
                rows["n_lines"].append(raw.count(b"\n"))
                rows["c_count"].append(raw.count(b"c"))
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, schema=LZ4_STATS_SCHEMA)
