"""Generate a larger, distribution-DIFFERENT fixture set (judge r4 #4).

The 4x probe in scale_probe.py replicates the driver's sf0.1 files, which
preserves every key distribution exactly — NDVs, skew, and broadcast sizes
all scale in lockstep, so a plan whose cost depends on one of them is never
stressed. This generator synthesizes a genuinely NEW dataset at an arbitrary
scale factor with the SAME schemas and categorical domains as the driver
fixtures (TESTDATA.md) but different:

- seed (777 vs the driver's 42), so no value-level overlap in facts;
- NDVs: customers/parts/suppliers/users scale with sf instead of being
  pinned at the sf0.1 counts;
- skew: order->customer and event->user activity follow a power law
  (top user ~sf*300 events) instead of uniform; one hot order carries a
  deliberately fat lineitem group;
- mix: event types, doc languages, and doc lengths are non-uniform
  (realistic long-tail) instead of the driver's near-uniform draws.

Dimension tables region/nation are emitted byte-identical in content (5/25
fixed rows) because queries reference their literal names (NATION_1 etc.).

Everything is generated distributedly (spark.range + column expressions,
seeded F.rand/F.randn) — no driver-side loops, so the same script produces
sf 10 on a cluster.

With --nulls, a deterministic ~2-3% of several nullable, non-key columns
(acctbals, event value/props, doc lang, part type, lineitem quantity and —
independently — extendedprice) are NULLed — stressing
the oracle pair's NULL semantics (aggregate skipping, null-group handling,
COALESCE paths) the all-populated driver fixtures never exercise.

With --unicode, the document vocabulary gains GNARLY tokens (accents, CJK,
Cyrillic, emoji, quotes, CSV/JSON/regex metacharacters, a literal tab) —
stressing every text operator's escaping, tokenization, and round-trips.
Since r12 it also plants CASE-FOLD traps (ß ﬁ İ — codepoints where the
JVM's full case mapping and DuckDB's simple 1:1 mapping disagree, some
length-changing: upper('ß')='SS' vs 'ẞ') in the text vocabulary AND in a
deterministic slice of documents.source, the group key that flows through
upper()/lower() in URL-synthesis queries: any case fold applied to
adversarial text must be ASCII-only (translate a-z↔A-Z) to be
cross-engine stable, and java.net.URI NULLs any non-ASCII host where a
regexp oracle would happily extract it.

With --empty, every table is written with ZERO rows but its exact schema
(r5 verdict #5): at 100 TB an empty partition/day/source is routine, and
medians, window frames, k-means seeds, and first()-style aggregates are
the classic empty-input breakers. The full differential sweep must come
back clean (0 rows or the query's defined scalar) on such a fixture.

With --dupes (r6), VALUE columns collapse to tiny distinct pools while id
columns stay unique: order/lineitem prices from 30-40 distinct values,
ship/order dates from 10-20 distinct days, event timestamps from 48
distinct instants, ~25 distinct document texts, exact-duplicate embedding
vectors for a third of rows. Every ORDER BY/LIMIT/rank/argmax over a value
column then runs tie-DENSE — any query whose cross-engine agreement
silently depends on value uniqueness (incomplete tie-break chains) fails
here and nowhere else.

With --extreme (r8), IEEE edge values and degenerate keys the other axes
never produce: ~1-in-37 embedding vectors carry a NaN component and
~1-in-41 / 1-in-43 carry a +Inf / -Inf component (the HOF dot/norm paths
and the moment partials had never seen a non-finite float); documents gain
zero-length (empty-string), single-token, and ~4000-word max-length texts;
and the events table collapses to a SINGLE user_id so every per-user
window/asof/session partition becomes one giant key.

With --dates (r8), temporal edge values every other axis keeps inside
1995-2024: a deterministic few percent of o_orderdate / l_shipdate /
events.ts land (a) in 1902-1909 (negative epoch seconds — floor-vs-
truncate division divergence territory), (b) in the final hour before
epoch 0 with millisecond fractions, (c) straddling the pandas
datetime64[ns] ceiling 2262-04-11T23:47:16.854 (every Arrow->pandas
boundary that carries a raw timestamp overflows past it — the ms-vs-s
confusion class of dirty event data), (d) in 2300-2304, and (events
only) (e) inside the 2024 America/New_York spring-forward and
Australia/Lord_Howe 30-minute fall-back windows, so non-UTC session-tz
sweeps actually cross a DST transition instead of bucketing mid-DST
January data.

With --negative (r9), sign edge values in the MEASURE columns every
other axis keeps positive: a deterministic ~1/59 of p_retailprice /
o_totalprice / l_quantity / l_extendedprice / events.value are NEGATED
(returns, credit memos, chargebacks — routine in real money data) and
~1/101 are EXACTLY 0.0 (freebies, zero-value pings). Every ln/sqrt/
division/weight that implicitly assumes positivity meets them: Spark
returns NULL/NaN for non-positive ln/sqrt where DuckDB hard-ERRORS, so
an unguarded oracle doesn't even produce a comparable result. c_acctbal
already ships negative (-999.99 floor), so customer-balance paths were
always exercised; this axis extends the property to the measures.

With --ctrl (r10), CONTROL/WHITESPACE TEXT DIRT the --unicode axis's
gnarly-but-clean tokens never produce — the byte-level filth a real
crawl ships: whitespace-ONLY documents ("  \\t "), untrimmed
leading/trailing padding, CRLF line endings replacing every space,
embedded NUL bytes, zero-width-space + RTL-override + ZWJ prefixes,
empty-STRING (not NULL) lang codes, and a source key with leading and
trailing spaces. Each stresses a distinct assumption: tokenizers that
split on a literal space vs whitespace-class regex, trim-before-compare
group keys, length vs token-count consistency, string equality through
NUL, and every text-quality ratio's divide-by-zero guard on a
zero-token doc that is NOT zero-chars.

With --nullkey (r10), NULL FOREIGN KEYS — the orphan rows every
100 TB system carries (anonymous events from logged-out users, orders
whose customer was GDPR-deleted, lineitems with unresolved part/supplier
references): a deterministic ~2% of events.user_id, orders.o_custkey,
lineitem.l_partkey and lineitem.l_suppkey are NULLed. PRIMARY ids stay
unique and non-NULL (identity is an upstream contract); only FK
references go dark. The class this stresses is NULL-key SEMANTICS
divergence: an equi-join drops NULL keys in both engines, but a window
PARTITION BY groups them into a real partition, COUNT(DISTINCT) skips
them, GROUP BY keeps them as a group — any query whose Spark plan and
SQL oracle express "per key" through DIFFERENT constructs from that
list silently disagrees on the orphans.

With --bigid (r10), SNOWFLAKE-SCALE SPARSE 64-BIT IDS: every id/FK
column (custkey, orderkey, partkey, suppkey, event_id, user_id, doc_id,
vec_id — nation/region keys excluded, queries reference their literal
0-24 domain) is mapped through the same affine warp
``id * 1_000_003 + 9_100_000_000_000_000``, landing every key ABOVE
2^53 (~9.007e15). Production 100 TB systems carry exactly such ids
(snowflake/UUID-derived ~1e18); below 2^53 every silent int64→float64
hop is lossless and therefore invisible. Above it, three failure
classes wake up: (a) any arithmetic key-packing ``id * k + x``
overflows LONG and hard-errors under ANSI Spark, (b) any id that rides
through a DOUBLE (pandas int64-with-NULLs→float64 coercion, double
division, percentile machinery) comes back corrupted by 1-1024 ulps,
(c) any SUM over an id-magnitude column overflows Spark's LONG
accumulator where DuckDB silently widens to INT128. The multiplier is
DELIBERATELY the same prime (1000003) the repo uses as its hash-mix
modulus, so every warped id is congruent to ONE constant mod 1000003 —
the residue-collapse a structured snowflake id space (timestamp |
worker | sequence bit fields) produces for real, which starves
hash-derived uniforms down to a handful of distinct values (caught the
q_sample_bootstrap empty-replicate division). The same affine map is
applied to both sides of every FK, so referential integrity and join
cardinalities are unchanged.

With --hotkey (r10), pathological KEY skew — the shape a 100 TB corpus
actually has and none of the other axes produce (--extreme collapses
events to a single user; this axis gives every hot-key table BOTH a
dominant key and a normal tail, which is what AQE skew handling, salting,
and per-key windows must survive TOGETHER): one user owns ~50% of all
events (the rest keep the power-law tail), one customer owns ~50% of all
orders, ~50% of documents are near-boilerplate (a fixed 40-word template
with ONE trailing word varying over 19 variants — every MinHash/SimHash
band hashes them into the same buckets, so LSH candidate generation meets
one enormous bucket), and ~50% of embedding vectors are near-identical
(one hot SRP/IVF bucket, cosine ~1 ties).

With --rowdup (r11), AT-LEAST-ONCE DUPLICATE ROWS: the reference IS an
at-least-once system (it acks by deleting the SQS message only AFTER the
parquet write, convertor/convertor.go:156-164 — a crash between the two
re-delivers the whole input), so a production ingest sees EXACT duplicate
rows including duplicated PRIMARY ids. --dupes collapses VALUE columns
while keeping ids unique; this axis is the complement nothing else
produces: a deterministic ~1/29 of every table's rows (dims included —
any notification can be re-delivered) appear twice and ~1/197 three
times, byte-identical copies selected by a full-row hash. It attacks
every "UNIQUE by key" assumption: argmax tie-break chains that end at a
no-longer-unique id, surrogate-id assignment, sequence-gap detection,
upsert/CDC key-match semantics, version-history keys, and per-key
accounting that divides by a row count it assumed equals the key count.

With --manyfiles (r11), a pathological file LAYOUT with byte-identical
CONTENT — the first axis stressing HOW the bytes sit on disk rather than
what they are. A 100 TB table is never one tidy file: every table is
fragmented into ~180-280 tiny parquet files (a few hundred rows each at
sf0.01), plus one larger straggler file written with a tiny row-group
size (mixed granularity within one directory), plus two EMPTY part
files with schema only (an empty day/source partition is routine). It
exercises file listing, per-file task scheduling, schema merge across
0-row files, and every file-count-sensitive invariant (compaction
accounting, per-file lineage, min/max pruning with hundreds of tiny
footers).

With --longtext (r11), per-ROW text VOLUME skew — the crawl-outlier
class no other axis produces (--extreme caps documents at ~4000 words;
key skew is --hotkey's job; this is CELL-size skew): a deterministic
~1/103 of documents become ~60k-word (~350 KB) book-length texts and
~1/211 become ~250k-word (~1.4 MB) megadocs (both built from the normal
vocabulary, so they are long but linguistically ordinary); ~1/109
become SPAM docs — one word repeated 30,000 times (one distinct
shingle/bigram/BPE pair at enormous multiplicity — the degenerate
counting shape); and ~1/331 become a single 64 KiB TOKEN with no
whitespace at all (binary blob / minified-JS class: 1 token whose
LENGTH is the document). Every per-document explode (shingles, grams,
BPE pairs, fingerprint windows), tokenizer, length-normalized score,
and pandas batch that sizes itself per row meets cells 4 decades above
the median; anything super-linear in document length dies here and
nowhere else. Composition: --hotkey's even-id boilerplate pins win
(longtext applies to its residues' odd ids only under --hotkey);
--extreme's empty/1-token degeneracies win on residue collision;
--ctrl's byte filth applies on top of whatever text stands.

With --evolve (r11), SCHEMA DRIFT across part files of one table — the
second layout axis, and the one closest to the reference's heart: its A4
semantics (unknown JSON keys dropped, missing fields filled,
convertor/struct.go) IS schema evolution, and a 100 TB lake lives it
constantly — a column added last quarter is absent from every file
written before, and a producer shipping a new field writes files the
readers' contract doesn't know yet. Per fact table (region/nation
excluded — queries reference their literal 5/25-row content), a
deterministic ~25% of rows land in OLD-schema part files missing one
late-added column (lineitem.l_tax, orders.o_orderpriority,
customer.c_mktsegment, part.p_size, supplier.s_acctbal, events.props,
documents.source, embeddings.label), and a disjoint ~10% land in
NEW-schema part files carrying one UNKNOWN extra column
(l_comment / o_clerk / c_phone / p_container / s_comment / ingest_ts /
crawl_id / model_ver) with the column ORDER reversed (parquet is
name-addressed; positional readers die here). The reader contract this
enforces engine-side (sources/io.py): expected columns come from the
CATALOG, missing-in-file reads as NULL, unknown columns are dropped
(A4), column order is irrelevant. The catch surface is NULLs appearing
in columns NO other axis nulls (l_tax inside every revenue formula,
group keys like c_mktsegment/o_orderpriority/source, events.props in
every JSON path) — the same NULL-semantics classes --nulls hunts, on
virgin columns. Since r12 the OLD-generation files of customer/part
additionally store one measure (c_acctbal / p_retailprice) as FLOAT32
— physical TYPE drift riding the name drift — exercising the widened
footer-union read (Spark mergeSchema hard-errors on float/double) and
the oracle's typed drift probe.

With --filedirt (r12), CORRUPT/PARTIAL/FOREIGN FILES — the third layout
axis, and the write-side complement of --evolve: the reference's loop is
not atomic (convertor/convertor.go:148-153 can die between create and
flush), so a production directory accumulates zero-byte parts, truncated
footers, wrong-format bytes under .parquet keys, stray operator files,
and commit-protocol leftovers. Injected per table with the CLEAN content
preserved byte-for-byte (see _inject_filedirt), so the quarantine read
of the dirty layout must equal the clean build exactly. Semantics under
test (sources/io.py): the DEFAULT read fails LOUDLY (silent data loss at
100 TB is worse than dying); JPC_FILE_POLICY=quarantine probes every
visible file (16 bytes IO each), reads only the intact ones, and REPORTS
the quarantined list; hidden files are ignored by the listing rule alone;
a mixed-codec directory is read transparently under either policy.

With --tz (r13), SESSION-TIMEZONE AND TIMESTAMP-FLAVOR TRAPS — the axis
the driver's own America/New_York default-session probe composes with.
Two halves. VALUES (events.ts only): deterministic bands land inside the
2024-11-03 America/New_York FALL-BACK window (04:30-06:30 UTC — every
local wall-clock in 01:00-02:00 EST/EDT happens TWICE; --dates plants
only the spring-forward gap), within ±90 s of a New_York midnight
(05:00 UTC — any date_trunc/day bucket computed in session tz instead of
the pinned UTC flips these rows across a day boundary), and within
±90 s of a UTC midnight (the mirror trap: session-tz bucketing that
"accidentally works" for mid-day data flips here in the other
direction). LAYOUT (the --evolve mechanism applied to the one type
family io.py special-cases): ~20% of events rows land in part files
whose ts is INT64 µs TIMESTAMP_NTZ (isAdjustedToUTC=false — the naive
producer), one part file is REWRITTEN as INT64 µs UTC-ADJUSTED
(isAdjustedToUTC=true — the spec-compliant producer), and the rest stay
Spark's INT96 default (the legacy writer) — the three timestamp
generations a real lake accumulates. The reader contract: all three
flavors denote the SAME instants (naive == UTC wall clock);
load_table's pinned-UTC session makes every election identity, DuckDB's
union_by_name promotes to TIMESTAMPTZ under the harness's pinned-UTC
connection, and the widen-policy footer union coerces timestamp flavors
to µs-UTC before unification (pa.unify_schemas refuses tz-flavor
mixes).

With --conflict (r13), CONFLICTING RE-DELIVERY — the non-idempotent
sibling of --rowdup, and the last at-least-once integrity violation the
reference can produce: a record UPDATED at the source between two
deliveries arrives twice with the SAME primary id but a DIFFERENT
payload (--rowdup's copies are byte-identical, so any order-dependent
per-key pick stays invisibly "correct"; a conflicting payload makes
every unstable pick VISIBLE as a cross-engine value divergence). A
deterministic ~1/37 of every table's rows (full-row hash, pre-warp)
gain a v2 copy and a disjoint ~1/211 gain v2 AND v3 (breaking "exactly
two copies" assumptions). Key columns (ids, FKs, l_linenumber) and
temporal columns (o_orderdate, l_shipdate, ts) are IDENTICAL across
versions — the ambiguity must not be resolvable by any (key, time)
sort — while payload attributes drift deterministically per version:
strings get a '~v2'/'~v3' suffix, doubles +0.125/+0.25 (exactly
representable), int payloads +1/+2 (overflow-guarded); arrays/binary
and events.props stay stable (valid-JSON drift is not this axis's job —
dirty bytes are --ctrl's). It attacks every first()/any_value(),
row_number/rank ordered by a no-longer-determining key, argmax chain,
dropDuplicates-by-key, upsert/CDC/SCD2 key-match, and as-of pick whose
tie-break assumed (id) or (id, ts) was a total order.

Usage: python scripts/gen_fixtures.py --sf 0.3 [--out DIR] [--nulls]
       [--unicode] [--empty] [--dupes] [--extreme] [--dates] [--negative]
       [--hotkey] [--bigid] [--ctrl] [--nullkey] [--rowdup] [--manyfiles]
       [--longtext] [--evolve] [--filedirt] [--tz] [--conflict]
Default out: $TMPDIR/jpc_genfix_sf<sf>[_nulls][_unicode][_empty][_dupes]
[_extreme][_dates][_negative][_hotkey][_bigid][_ctrl][_nullkey][_rowdup]
[_manyfiles][_longtext][_evolve][_filedirt][_tz][_conflict] — the
variant suffix keeps adversarial sets from being mistaken for the plain
one by consumers that reuse an existing dir (scale_probe_gen's
exists-check).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 777

WORDS = (
    "batch part spark line column order small sort fast value scan hash "
    "slow query agg table vector big join shuffle stream window merge "
    "filter codec page group stage task skew broadcast spill arrow plan"
).split()

ADJ = ("large hot blue old cold new red small dark pale").split()
NOUN = ("ring bolt plate cap washer gear spring valve").split()

# --unicode: tokens a real web corpus carries and naive string handling
# chokes on — combining accents, CJK/Cyrillic, quotes, CSV/JSON/regex
# metacharacters, a literal tab, an emoji
GNARLY = [
    "café", "naïve", "Übung", "模型训练", "данные", "🦆",
    "don't", 'say"this"', "comma,word", "semi;colon", "tab\tchar",
    "back\\slash", "a+b*", "[bracket]", "(paren)", "per%cent",
    "{brace}", "pipe|char", "question?", "dollar$sign",
    # r12 case-fold traps: codepoints where FULL Unicode case mapping
    # (JVM/Spark: ß→SS, ﬁ→FI, ﬆ→ST, İ→i+U+0307 — length-changing) and
    # SIMPLE 1:1 mapping (DuckDB/utf8proc: ß→ẞ, ﬁ→ﬁ, İ→i) disagree.
    # Any upper()/lower() a query applies to adversarial text diverges
    # cross-engine on these; key-normalization must fold ASCII-only.
    "straße", "ﬁnance", "İstanbul", "Σίσυφος", "ﬆop", "weiß",
]


#: --bigid affine warp: every key lands above 2^53 (min 9.1e15). Worst
#: case is o_orderkey/l_orderkey at sf 100 (n_ord = 1.5e8):
#: 1.5e8 * 1e6 + 9.1e15 ~ 1.5e14 + 9.1e15 ~ 9.3e15 — three decades
#: under LONG max 9.22e18, so even a further 100x id space is safe.
BIGID_MUL = 1_000_003
BIGID_OFF = 9_100_000_000_000_000

#: id/FK columns the --bigid warp rewrites wherever they appear, keeping
#: both sides of every FK on the same affine map. nation/region keys are
#: deliberately absent: queries reference their literal 0-24 domain.
BIGID_COLS = frozenset({
    "c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "user_id",
    "doc_id", "vec_id",
})

#: --conflict: columns IDENTICAL across conflicting versions of one row.
#: Keys/FKs (referential integrity: an update never rewrites identity)
#: plus the temporal columns (so no (key, time) sort can re-totalize the
#: pick — that ambiguity IS the axis) plus events.props (valid-JSON
#: drift would be a dirty-bytes trap, which is --ctrl's job).
CONFLICT_KEEP = BIGID_COLS | {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_nationkey",
    "s_nationkey", "l_linenumber", "o_orderdate", "l_shipdate", "ts",
    "props",
}

#: --evolve: the "late-added" column OLD part files are missing (read back
#: as NULL under the catalog contract) and the UNKNOWN column NEW part
#: files carry (dropped on read, reference A4). region/nation excluded:
#: queries reference their literal 5/25-row content.
EVOLVE_DROP = {
    "customer": "c_mktsegment", "supplier": "s_acctbal", "part": "p_size",
    "orders": "o_orderpriority", "lineitem": "l_tax", "events": "props",
    "documents": "source", "embeddings": "label",
}
EVOLVE_EXTRA = {
    "customer": "c_phone", "supplier": "s_comment", "part": "p_container",
    "orders": "o_clerk", "lineitem": "l_comment", "events": "ingest_ts",
    "documents": "crawl_id", "embeddings": "model_ver",
}
#: --evolve narrow mode (r12): the same OLD-generation files also store one
#: measure in the narrower physical type the ancient producer used
#: (float32 pre-migration) — the layout a widened column leaves behind in
#: a real lake. Spark's mergeSchema refuses to merge float/double
#: (CANNOT_MERGE_SCHEMAS), so this exercises the footer-union widened read
#: (sources/io.py read_widened) and the oracle's typed drift probe
#: (tests/oracle_utils.register_duck_views). The float round-trip changes
#: the stored VALUE identically for both engines (same bits, widened), so
#: cross-engine parity is unaffected.
EVOLVE_NARROW = {"customer": "c_acctbal", "part": "p_retailprice"}


def _inject_filedirt(target: str) -> None:
    """--filedirt (r12): corrupt/partial/foreign FILES as a layout axis.

    The reference's write loop is not atomic (convertor/convertor.go:
    148-153 can die between create and flush), so a production directory
    accumulates exactly this dirt. Injected per table, with the CLEAN
    content preserved byte-for-byte (dirt files add zero readable rows;
    the codec rewrite keeps its rows), so a quarantine read of the dirty
    layout must equal the same build without --filedirt:

    - one existing part file REWRITTEN as gzip (mixed-codec directory —
      codec is per-column-chunk metadata; both engines must read it
      transparently, no quarantine);
    - a zero-byte ``part-*.parquet`` (crash before the first byte);
    - a TRUNCATED copy of a real part file (mid-write crash: leading
      magic intact, footer gone);
    - JSON bytes under a ``.parquet`` name (producer wrote the wrong
      format);
    - a stray visible ``stray-notes.json`` (Spark's directory read
      attempts EVERY visible file regardless of extension — under the
      strict default this kills the read loudly; quarantine probes and
      skips it);
    - hidden commit-protocol leftovers both engines must ignore by the
      LISTING rule alone: ``_SUCCESS``, a ``.crc``, and — the trap — a
      VALID parquet duplicate of a real part file under a leading
      underscore (``_committed_dup.parquet``): any lister that keys on
      the extension instead of Spark's hidden rule silently
      double-counts those rows.
    """
    import glob
    import shutil

    import pyarrow.parquet as pq

    parts = sorted(glob.glob(os.path.join(target, "part-*.parquet")))
    assert parts, target
    # coerce INT96 to MICROSECOND on read (r12 sf1.0 catch): pyarrow's
    # default reads INT96 into nanosecond timestamps, and any --dates
    # instant past the int64-ns ceiling (2262-04-11) silently WRAPS
    # (2262-04-14 -> 1677-09-23, a full 2^64 ns turn) — the rewritten
    # file then carries a same-primary-id row with a DIFFERENT payload,
    # violating this injector's clean-content-preserved contract (and
    # the at-least-once model's identical-copies invariant). Spark
    # writes µs-quantized values into INT96, so µs coercion is lossless.
    pf = pq.ParquetFile(parts[0], coerce_int96_timestamp_unit="us")
    # preserve the PHYSICAL timestamp layout: Spark writes LTZ timestamps
    # as INT96 by default; a plain pyarrow round-trip would re-emit them
    # as INT64(NANOS), changing the column's type across part files —
    # that's the --evolve axis's job, not this one (codec ONLY must vary)
    phys = {
        pf.schema.column(i).physical_type for i in range(len(pf.schema))
    }
    tbl = pf.read()
    os.remove(parts[0])
    gz = os.path.join(target, "part-00000-gz-dirt.parquet")
    pq.write_table(
        tbl, gz, compression="gzip",
        use_deprecated_int96_timestamps="INT96" in phys,
    )
    open(os.path.join(target, "part-zzz-zero-dirt.parquet"), "wb").close()
    with open(gz, "rb") as f:
        blob = f.read()
    with open(
        os.path.join(target, "part-zzz-trunc-dirt.parquet"), "wb"
    ) as f:
        f.write(blob[: max(4, len(blob) * 2 // 3)])
    with open(
        os.path.join(target, "part-zzz-json-dirt.parquet"), "wb"
    ) as f:
        f.write(b'{"rows": "this is not parquet"}\n')
    with open(os.path.join(target, "stray-notes.json"), "wb") as f:
        f.write(b'{"note": "operator scratch file"}\n')
    shutil.copyfile(gz, os.path.join(target, "_committed_dup.parquet"))
    open(os.path.join(target, "_SUCCESS"), "wb").close()
    # the checksum sidecar is named for a GHOST data file: Hadoop's
    # LocalFileSystem (ChecksumFileSystem) VERIFIES a matching `.crc`
    # against its data file, so a garbage sidecar for a real part would
    # poison a perfectly valid read — a Hadoop-local quirk, not the
    # listing-rule property this axis pins (HDFS/S3A don't use sidecars)
    with open(
        os.path.join(target, ".part-zzz-ghost.parquet.crc"), "wb"
    ) as f:
        f.write(b"\x00" * 8)


def _retype_one_part_utc(target: str) -> None:
    """--tz (r13): rewrite ONE part file's ts column as INT64 µs with
    isAdjustedToUTC=true — the spec-compliant third timestamp generation
    next to Spark's INT96 default and the naive producer's µs NTZ files.
    Content is preserved exactly: the INT96 read coerces to MICROSECONDS
    (the r12 lesson — pyarrow's default ns read silently wraps --dates
    instants past 2262-04-11 by a full 2^64 ns; Spark writes µs-quantized
    values into INT96, so µs coercion is lossless), and the naive→UTC
    cast is metadata-only (verified value-identical in the r13 probes)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    parts = sorted(glob.glob(os.path.join(target, "part-*.parquet")))
    assert parts, target
    # rewrite one of the NTZ (INT64 µs, naive) files where possible, so
    # the directory keeps all THREE flavors even at 1-part scale factors
    # (retyping the only INT96 file would collapse the mix to two)
    ntz = [
        p
        for p in parts
        if str(pq.read_schema(p).field("ts").type) == "timestamp[us]"
    ]
    src = ntz[0] if ntz else parts[0]
    t = pq.ParquetFile(src, coerce_int96_timestamp_unit="us").read()
    i = t.schema.get_field_index("ts")
    typ = pa.timestamp("us", tz="UTC")
    t = t.set_column(
        i, pa.field("ts", typ, t.schema.field(i).nullable),
        t.column(i).cast(typ),
    )
    os.remove(src)
    pq.write_table(t, os.path.join(target, "part-00000-utcadj-tz.parquet"))


def build(
    spark, dst: str, sf: float, nulls: bool = False,
    unicode_text: bool = False, empty: bool = False,
    dupes: bool = False, extreme: bool = False, dates: bool = False,
    negative: bool = False, hotkey: bool = False, bigid: bool = False,
    ctrl: bool = False, nullkey_on: bool = False, rowdup: bool = False,
    manyfiles: bool = False, longtext: bool = False, evolve: bool = False,
    filedirt: bool = False, tz_on: bool = False, conflict: bool = False,
) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)

    def dd(normal_col, dupe_col):
        """With --dupes, swap a high-NDV value column for a tiny pool."""
        return dupe_col if dupes else normal_col

    def date_warp(col, key, evt=False):
        """With --dates, override a deterministic ~5% of timestamps with
        temporal edge values (see module docstring). ``key`` is the row's
        unique id so the warp is reproducible and scale-free; moduli are
        primes distinct per rule so the bands never alias."""
        if not dates:
            return col
        e = (
            # (a) 1902-1909: negative epoch seconds with ms fractions —
            # unix_timestamp/epoch flooring vs toward-zero truncation only
            # diverges below zero
            F.when(
                key % 67 == 3,
                F.timestamp_seconds(
                    F.lit(-2145916800)
                    + (key % 2921) * 86400 + key % 86400
                    + (key % 997) / 1000.0
                ),
            )
            # (b) the last hour before epoch 0, fractional: -0.001s etc.
            .when(
                key % 73 == 5,
                F.timestamp_seconds(
                    -((key % 3600) + (key % 997) / 1000.0) - 0.001
                ),
            )
            # (c) straddle the pandas datetime64[ns] max
            # (2262-04-11T23:47:16.854775807): -4d..+5d around it, so any
            # Arrow->pandas ns cast sees both sides of the cliff
            .when(
                key % 79 == 7,
                F.timestamp_seconds(
                    F.lit(9223372036)
                    - (key % 5) * 86400 + (key % 11) * 43200
                ),
            )
            # (d) 2300-2304: the ms-vs-s dirty-data class
            .when(
                key % 83 == 11,
                F.timestamp_seconds(
                    F.lit(10413792000) + (key % 1825) * 86400 + key % 86400
                ),
            )
        )
        if evt:
            e = (
                # (e) 2024-03-10 06:00-08:00 UTC: America/New_York
                # spring-forward (02:00-03:00 local never exists)
                e.when(
                    key % 89 == 13,
                    F.timestamp_seconds(F.lit(1710050400) + key % 7200),
                )
                # 2024-04-06 13:30-15:30 UTC: Australia/Lord_Howe 30-min
                # fall-back (02:00-01:30 local repeats)
                .when(
                    key % 89 == 47,
                    F.timestamp_seconds(F.lit(1712410200) + key % 7200),
                )
            )
        return e.otherwise(col)

    def tz_warp(col, key):
        """With --tz, override a deterministic ~3% of EVENT timestamps
        with session-timezone traps (module docstring): the 2024
        America/New_York FALL-BACK window (each local wall-clock in
        01:00-02:00 happens twice — the ambiguity --dates' spring-forward
        band lacks), ±90 s of a New_York midnight, and ±90 s of a UTC
        midnight (day-bucket flips in both directions for any date_trunc
        computed in the wrong timezone). Applied OUTSIDE date_warp so the
        bands win on residue collisions; modulus 97 is distinct from
        every date_warp band so composition stays dense."""
        if not tz_on:
            return col
        return (
            # 2024-11-03 04:30-06:30 UTC: America/New_York fall-back
            # (01:00-02:00 local repeats; UTC-5 vs UTC-4 ambiguity)
            F.when(
                key % 97 == 17,
                F.timestamp_seconds(F.lit(1730608200) + key % 7200),
            )
            # ±90 s of New_York midnight 2024-01-15 (05:00:00 UTC)
            .when(
                key % 97 == 61,
                F.timestamp_seconds(
                    F.lit(1705294800 - 90) + key % 181
                    + (key % 997) / 1000.0
                ),
            )
            # ±90 s of UTC midnight 2024-01-20 (00:00:00 UTC)
            .when(
                key % 97 == 83,
                F.timestamp_seconds(
                    F.lit(1705708800 - 90) + key % 181
                    + (key % 991) / 1000.0
                ),
            )
            .otherwise(col)
        )

    def neg_warp(col, key, salt):
        """With --negative, negate ~1/59 of values, zero ~1/101
        (refunds / credit memos / freebies), and plant exact IEEE -0.0
        in ~1/149 (r12: a voided transaction recorded with the negative
        sign — the signed-zero twin that caught q_stream_join's binary
        stream-state key; before this band -0.0 only arose when a raw
        zero randomly met the negate band, populating at sf0.1+ only).
        ``key`` is the row id so the warp is reproducible and
        scale-free; the salt de-aliases bands across columns of the
        same table. When-chain precedence (r12 ADVICE): the bands are
        evaluated in order, so rows where %149==11 coincides with the
        earlier %59==7 or %101==13 bands take THOSE branches — the
        effective -0.0 density is slightly below 1/149 (parity tests
        assert presence, not exact density, so this is by design)."""
        if not negative:
            return col
        return (
            F.when((key + salt) % 59 == 7, -col)
            .when((key + salt) % 101 == 13, F.lit(0.0))
            .when((key + salt) % 149 == 11, F.lit(-0.0))
            .otherwise(col)
        )

    def nullkey(col, key, mod, res):
        """With --nullkey, NULL a deterministic ~1/mod of FK values (an
        orphan row); prime moduli with distinct residues per column so
        orphan sets never alias across tables."""
        if not nullkey_on:
            return col
        return F.when(key % mod == res, F.lit(None)).otherwise(col)

    def hot(col, key):
        """With --hotkey, route every even-keyed row to key 0 — one key
        owns ~50% of the table while odd rows keep the normal tail."""
        if not hotkey:
            return col
        return F.when(key % 2 == 0, F.lit(0).cast("bigint")).otherwise(col)

    def maybe_null(col, salt, frac=0.025):
        """With --nulls, NULL out a deterministic ~frac of values."""
        if not nulls:
            return col
        return F.when(F.rand(SEED + 9000 + salt) < frac, F.lit(None)).otherwise(
            col
        )
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    def u(lo, hi, salt):  # uniform double in [lo, hi)
        return F.rand(SEED + salt) * (hi - lo) + lo

    def ui(lo, hi, salt):  # uniform int in [lo, hi]
        return F.floor(u(lo, hi + 1, salt)).cast("int")

    def pick(arr, salt, power=1.0):
        """Pick from a literal array; power>1 skews toward index 0."""
        lit = F.array(*[F.lit(x) for x in arr])
        idx = F.floor(
            F.pow(F.rand(SEED + salt), power) * len(arr)
        ).cast("int")
        return F.element_at(lit, idx + 1)

    def write(df, name, parts):
        if conflict:
            # conflicting re-delivery (module docstring): the update
            # happened at the SOURCE, so it precedes --rowdup's transport
            # duplication (a v2 copy can itself be re-delivered exactly)
            # and the --bigid warp (keys identical across versions get
            # the same affine map — referential integrity holds). The
            # selection modulus 6421 is distinct from every other axis's
            # so compositions stay independent.
            hc = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(6421))

            def _drift(src, ver):
                out = src
                for fld in src.schema.fields:
                    if fld.name in CONFLICT_KEEP:
                        continue
                    t = fld.dataType.simpleString()
                    if t == "string":
                        out = out.withColumn(
                            fld.name,
                            F.concat(F.col(fld.name), F.lit(f"~v{ver}")),
                        )
                    elif t == "double":
                        # exactly-representable delta: both engines see
                        # bit-identical drifted values
                        out = out.withColumn(
                            fld.name,
                            F.col(fld.name) + F.lit(0.125 * (ver - 1)),
                        )
                    elif t in ("int", "bigint"):
                        # ANSI-safe: step DOWN at the type ceiling so a
                        # composed --extreme/--longtext max never throws
                        lim = (2**31 - 3) if t == "int" else (2**63 - 3)
                        out = out.withColumn(
                            fld.name,
                            F.col(fld.name)
                            + F.when(
                                F.col(fld.name) < F.lit(lim),
                                F.lit(ver - 1),
                            ).otherwise(F.lit(-(ver - 1))).cast(t),
                        )
                return out

            v2 = _drift(df.filter((hc % 37 == 17) | (hc % 211 == 5)), 2)
            v3 = _drift(df.filter(hc % 211 == 5), 3)
            df = df.unionByName(v2).unionByName(v3)
        if rowdup:
            # at-least-once re-delivery: EXACT duplicate rows including
            # duplicated primary ids (module docstring). Selected by a
            # deterministic full-row hash (pmod, not abs: ANSI abs throws
            # on Integer.MIN_VALUE) so every axis composition duplicates
            # reproducibly; applied BEFORE the --bigid warp so the same
            # rows duplicate with and without it (the warp is a pure
            # per-value map, so copies stay byte-identical either way).
            h = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(5741))
            twice = df.filter(h % 29 == 11)       # ~3.4%: delivered twice
            thrice = df.filter(h % 197 == 13)     # ~0.5%: delivered 3x
            df = (
                df.unionByName(twice)
                .unionByName(thrice)
                .unionByName(thrice)
            )
        if bigid:
            # post-pass, so the build logic above keeps operating on the
            # dense 0..n raw ids (its %-rules and rand-index FKs assume
            # them); the SAME affine map on PK and FK sides preserves
            # referential integrity and every join cardinality
            for c in df.columns:
                if c in BIGID_COLS:
                    df = df.withColumn(
                        c,
                        F.col(c).cast("bigint") * BIGID_MUL + BIGID_OFF,
                    )
        if empty:
            # zero rows, exact schema — limit(0) preserves every column
            # type the populated variant would have written
            df, parts = df.limit(0), 1
        target = os.path.join(dst, f"{name}.parquet")
        evolve_old = evolve_new = None
        if evolve and not empty and name in EVOLVE_DROP:
            # schema drift (module docstring): ~25% of rows into OLD-schema
            # files missing the late-added column, a disjoint ~9% into
            # NEW-schema files carrying one unknown extra column with the
            # column order REVERSED (parquet is name-addressed; the layout
            # must not care). Full-row-hash selection, so composition with
            # --rowdup keeps every re-delivered copy in one generation.
            g = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(10007))
            extra = (
                F.col("ts") if name == "events"
                else F.col("doc_id") if name == "documents"
                else F.format_string(
                    "unk-%d",
                    F.pmod(F.hash(F.col(df.columns[0])), F.lit(9973)),
                )
            )
            evolve_old = df.filter(g % 4 == 1).drop(EVOLVE_DROP[name])
            if name in EVOLVE_NARROW:
                evolve_old = evolve_old.withColumn(
                    EVOLVE_NARROW[name],
                    F.col(EVOLVE_NARROW[name]).cast("float"),
                )
            new = df.filter((g % 4 != 1) & (g % 11 == 3)).withColumn(
                EVOLVE_EXTRA[name], extra
            )
            evolve_new = new.select(*reversed(new.columns))
            df = df.filter((g % 4 != 1) & (g % 11 != 3))
        tz_ntz = None
        if tz_on and not empty and name == "events":
            # timestamp-FLAVOR drift (module docstring): ~20% of rows into
            # part files whose ts is INT64 µs TIMESTAMP_NTZ (the naive
            # producer; the cast is wall-clock identity under the gen
            # session's pinned UTC), the rest stay Spark's INT96 default,
            # and _retype_one_part_utc below rewrites one file as µs
            # UTC-adjusted. Full-row-hash selection (rowdup-stable), a
            # modulus distinct from the --evolve split's.
            gtz = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(4093))
            tz_ntz = df.filter(gtz % 5 == 2).withColumn(
                "ts", F.expr("CAST(ts AS TIMESTAMP_NTZ)")
            )
            df = df.filter(gtz % 5 != 2)
        if manyfiles and not empty:
            # pathological LAYOUT, identical content (module docstring):
            # ~180-280 tiny files (round-robin; per-table count derived
            # from the name so tables don't share a layout), one larger
            # straggler with TINY row groups, two 0-row schema-only part
            # files. Row-to-file assignment is not deterministic (round
            # robin) — only the CONTENT multiset matters downstream.
            import zlib

            n_files = 181 + zlib.crc32(name.encode()) % 97
            grainy = F.pmod(
                F.hash(*[F.col(c) for c in df.columns]), F.lit(7)
            ) == 0
            df.filter(~grainy).repartition(n_files).write.mode(
                "overwrite"
            ).parquet(target)
            df.filter(grainy).coalesce(1).write.option(
                "parquet.block.size", 65536
            ).mode("append").parquet(target)
            for _ in range(2):
                df.limit(0).coalesce(1).write.mode("append").parquet(target)
        else:
            df.repartition(parts).write.mode("overwrite").parquet(target)
        if evolve_old is not None:
            evolve_old.coalesce(2).write.mode("append").parquet(target)
            evolve_new.coalesce(2).write.mode("append").parquet(target)
        if tz_ntz is not None:
            tz_ntz.coalesce(2).write.mode("append").parquet(target)
            _retype_one_part_utc(target)
        if filedirt and not empty:
            _inject_filedirt(target)
        print(f"gen {name}", file=sys.stderr)

    # -- fixed dims: identical content to the driver fixtures -------------
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write(
        spark.range(5).select(
            F.col("id").cast("int").alias("r_regionkey"),
            F.element_at(
                F.array(*[F.lit(r) for r in regions]),
                F.col("id").cast("int") + 1,
            ).alias("r_name"),
        ),
        "region", 1,
    )
    write(
        spark.range(25).select(
            F.col("id").cast("int").alias("n_nationkey"),
            F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
            (F.col("id") % 5).cast("int").alias("n_regionkey"),
        ),
        "nation", 1,
    )

    # -- scaled dims ------------------------------------------------------
    segs = ["MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "BUILDING"]
    write(
        spark.range(n_cust).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
            ui(0, 24, 1).alias("c_nationkey"),
            maybe_null(F.round(u(-999.99, 9999.99, 2), 2), 2).alias("c_acctbal"),
            pick(segs, 3, power=1.6).alias("c_mktsegment"),  # skewed mix
        ),
        "customer", max(1, int(32 * sf / 0.3)),
    )
    write(
        spark.range(n_supp).select(
            F.col("id").alias("s_suppkey"),
            F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
            ui(0, 24, 4).alias("s_nationkey"),
            maybe_null(F.round(u(-999.99, 9999.99, 5), 2), 5).alias("s_acctbal"),
        ),
        "supplier", 4,
    )
    types = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
    write(
        spark.range(n_part).select(
            F.col("id").alias("p_partkey"),
            F.concat(
                pick(ADJ, 6), F.lit(" "), pick(NOUN, 7)
            ).alias("p_name"),
            F.concat(
                F.lit("Brand#"), ui(1, 5, 8), ui(1, 5, 9)
            ).alias("p_brand"),
            maybe_null(pick(types, 10, power=1.4), 10).alias("p_type"),
            ui(1, 50, 11).alias("p_size"),
            neg_warp(
                F.round(u(900.0, 2100.0, 12), 2), F.col("id"), 1
            ).alias("p_retailprice"),
        ),
        "part", max(1, int(32 * sf / 0.3)),
    )

    # -- facts: skewed foreign keys --------------------------------------
    # power-law customer: cust = floor(rand^3 * n) -> top customer holds
    # ~sf*1000 orders where the driver fixture is uniform (~10)
    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        nullkey(
            hot(
                F.floor(F.pow(F.rand(SEED + 13), 3.0) * n_cust), F.col("id")
            ),
            F.col("id"), 59, 17,
        ).alias("o_custkey"),
        pick(statuses, 14, power=1.3).alias("o_orderstatus"),
        neg_warp(
            dd(
                F.round(u(1000.0, 500000.0, 15), 2),
                F.round((F.floor(u(0, 30, 15)) + 1) * 9999.99, 2),
            ),
            F.col("id"),
            2,
        ).alias("o_totalprice"),
        # fractional seconds on purpose: stresses oracle truncate-vs-round
        # drift (unix_timestamp truncates; DuckDB's BIGINT cast rounds)
        date_warp(
            dd(
                F.timestamp_seconds(
                    F.lit(788918400)  # 1995-01-01 UTC
                    + u(0, 6.6 * 365 * 86400, 16)
                ),
                F.timestamp_seconds(
                    F.lit(788918400)
                    + F.floor(u(0, 10, 16)).cast("long") * (86400 * 73)
                ),
            ),
            F.col("id"),
        ).alias("o_orderdate"),
        pick(prios, 17, power=1.5).alias("o_orderpriority"),
    )
    write(orders, "orders", max(1, int(32 * sf / 0.1)))

    # lineitem: l_orderkey = floor(rand^1.5 * n_ord) gives a skewed
    # lines-per-order distribution (hot orders carry dozens of lines)
    write(
        spark.range(n_li).select(
            F.floor(
                F.pow(F.rand(SEED + 18), 1.5) * n_ord
            ).alias("l_orderkey"),
            nullkey(
                F.floor(F.pow(F.rand(SEED + 19), 2.0) * n_part),
                F.col("id"), 61, 23,
            ).alias("l_partkey"),
            nullkey(
                F.floor(F.rand(SEED + 20) * n_supp), F.col("id"), 67, 29
            ).alias("l_suppkey"),
            ui(1, 7, 21).alias("l_linenumber"),
            # nullable: the quality-gate dead-letter contract (and every
            # SUM/AVG/median over quantity) must survive NULL quantities
            maybe_null(
                neg_warp(
                    F.floor(u(1, 51, 22)).cast("double"), F.col("id"), 3
                ),
                22,
            ).alias("l_quantity"),
            # nullable INDEPENDENTLY of l_quantity (different salt): a
            # price-NULL/qty-present row is the case that splits a
            # SUM(p*q)/SUM(q) oracle from a both-masked reimplementation
            # (r7 verdict #2, q_udaf_pandas)
            maybe_null(
                neg_warp(
                    dd(
                        F.round(u(900.0, 105000.0, 23), 2),
                        F.round((F.floor(u(0, 40, 23)) + 1) * 2499.75, 2),
                    ),
                    F.col("id"),
                    4,
                ),
                23,
            ).alias("l_extendedprice"),
            (F.floor(u(0, 11, 24)) / 100.0).alias("l_discount"),
            (F.floor(u(0, 9, 25)) / 100.0).alias("l_tax"),
            pick(["R", "A", "N"], 26, power=1.2).alias("l_returnflag"),
            pick(["O", "F"], 27).alias("l_linestatus"),
            date_warp(
                dd(
                    F.timestamp_seconds(
                        F.lit(788918400) + u(86400, 6.9 * 365 * 86400, 28)
                    ),
                    F.timestamp_seconds(
                        F.lit(788918400)
                        + (F.floor(u(0, 20, 28)).cast("long") + 1)
                        * (86400 * 100)
                    ),
                ),
                F.col("id"),
            ).alias("l_shipdate"),
        ),
        "lineitem", max(1, int(32 * sf / 0.1)),
    )

    # events: Zipf-ish users (rand^4), long-tail type mix, January-2024
    # window like the driver's but microsecond-grained
    etypes = ["view", "click", "purchase", "signup", "error"]
    write(
        spark.range(n_ev).select(
            F.col("id").alias("event_id"),
            tz_warp(
                date_warp(
                    dd(
                        F.timestamp_seconds(
                            F.lit(1704067200)  # 2024-01-01 UTC
                            + u(0, 30 * 86400, 29)
                        ),
                        # 48 distinct instants: tie-DENSE (user, ts) pairs
                        # drive every asof/nearest/window tiebreak through
                        # event_id
                        F.timestamp_seconds(
                            F.lit(1704067200)
                            + F.floor(u(0, 48, 29)).cast("long") * 53754
                        ),
                    ),
                    F.col("id"),
                    evt=True,
                ),
                F.col("id"),
            ).alias("ts"),
            # --extreme: ONE user owns every event — per-user windows,
            # asof partitions, and sessionization all collapse to a single
            # giant key (the 100 TB bot-user / default-id degeneracy)
            nullkey(
                (
                    F.lit(0).cast("bigint") if extreme
                    else hot(
                        F.floor(F.pow(F.rand(SEED + 30), 4.0) * n_users),
                        F.col("id"),
                    )
                ),
                F.col("id"), 53, 31,
            ).alias("user_id"),
            pick(etypes, 31, power=2.2).alias("event_type"),
            maybe_null(
                neg_warp(
                    dd(
                        F.round(F.pow(F.rand(SEED + 32), 2.0) * 560.0, 2),
                        F.round(F.floor(u(0, 10, 32)) * 56.0, 2),
                    ),
                    F.col("id"),
                    5,
                ),
                32,
            ).alias("value"),
            maybe_null(
                F.format_string('{"k": %d}', ui(0, 99, 33)), 33
            ).alias("props"),
        ),
        "events", max(1, int(32 * sf / 0.1)),
    )

    # documents: long-tail lengths (rand^2 * 120 + 5 words), skewed lang
    # and source mix; ~2% exact duplicates via doc_id collapsing
    langs = ["en", "zh", "es", "fr", "de"]
    vocab = WORDS + GNARLY if unicode_text else WORDS
    word_arr = F.array(*[F.lit(w) for w in vocab])
    docs = spark.range(n_doc).select(
        F.col("id").alias("doc_id"),
        maybe_null(pick(langs, 35, power=2.0), 35).alias("lang"),
        F.concat(
            F.lit("src"), F.floor(F.pow(F.rand(SEED + 36), 1.7) * 20)
        ).alias("source"),
        # seed word index: duplicates share it -> identical text
        # (--dupes: 25 bases total -> <=25 distinct texts, thousands of
        # exact copies each)
        dd(
            F.when(
                F.rand(SEED + 37) < 0.02, F.lit(0)
            ).otherwise(F.col("id") % 9973),
            F.col("id") % 25,
        ).alias("base"),
    ).withColumn(
        # dup docs (shared base) must also share a length to be EXACT dups
        "n_words",
        dd(
            F.when(F.col("base") == 0, F.lit(40)).otherwise(
                F.floor(F.pow(F.rand(SEED + 34), 2.0) * 120 + 5)
            ),
            F.lit(10) + F.col("base") % 30,
        ),
    )
    if longtext:
        # per-row VOLUME skew (module docstring): book-length and megadoc
        # texts from the normal vocabulary. Placed BEFORE the --extreme and
        # --hotkey overrides so their pinned degeneracies (empty/1-token
        # docs, even-id boilerplate) win on residue collision — both axes
        # still populate, precedence is just defined.
        docs = docs.withColumn(
            "n_words",
            F.when(F.col("doc_id") % 103 == 41, F.lit(60_000))
            .when(F.col("doc_id") % 211 == 89, F.lit(250_000))
            .otherwise(F.col("n_words")),
        )
    if extreme:
        # length degeneracies a real crawl produces: empty documents,
        # single-token documents, and ~4000-word (tens-of-KB) outliers —
        # tokenizers, shingle windows, and length-normalized scores must
        # survive all three
        # non-zero residues for the 1-token/long rules: doc_id 0 would
        # otherwise satisfy every `% p == 0` rule at once and tiny (sf0.001)
        # id spaces would never produce a 1-token doc
        docs = docs.withColumn(
            "n_words",
            F.when(F.col("doc_id") % 53 == 0, F.lit(0))
            .when(F.col("doc_id") % 59 == 17, F.lit(1))
            .when(F.col("doc_id") % 101 == 29, F.lit(4000))
            .otherwise(F.col("n_words")),
        )
    if hotkey:
        # ~50% of docs become NEAR-boilerplate: a fixed 40-word template
        # (base 0, the same seed the ~2% exact-dup rule uses) with ONE
        # trailing word varying over 19 variants — pairwise Jaccard ~0.9,
        # so every banded MinHash/SimHash signature collides and LSH
        # candidate generation meets one enormous bucket, while the
        # variation keeps them NEAR-dups (the exact-dedup path must NOT
        # collapse them). Realized below by pinning (base, n_words) here
        # and appending the variant word after the text is built.
        docs = docs.withColumn(
            "base",
            F.when(F.col("doc_id") % 2 == 0, F.lit(0)).otherwise(
                F.col("base")
            ),
        ).withColumn(
            "n_words",
            F.when(F.col("doc_id") % 2 == 0, F.lit(40)).otherwise(
                F.col("n_words")
            ),
        )
    docs = docs.select(
        "doc_id", "lang", "source",
        # n_words == 0 must yield "" — sequence(0, -1) would DESCEND and
        # feed negative modulo indices into element_at
        F.when(F.col("n_words") == 0, F.lit("")).otherwise(
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.col("n_words"), F.lit(1)) - 1
                    ),
                    lambda i: F.element_at(
                        word_arr,
                        (
                            (F.col("base") + i * 31 + (i * i) % 17)
                            % len(vocab)
                        ).cast("int") + 1,
                    ),
                ),
                " ",
            )
        ).alias("text"),
    )
    if hotkey:
        docs = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" "),
                    F.element_at(
                        word_arr,
                        (F.col("doc_id") % 19).cast("int") + 1,
                    ),
                ),
            ).otherwise(F.col("text")),
        )
    if longtext:
        # post-build text replacements (module docstring): SPAM (one word
        # x 30k — one distinct shingle at enormous multiplicity) and a
        # single 64 KiB whitespace-free TOKEN. Skipped on --hotkey's even
        # ids (their boilerplate shape is a pinned invariant); applied
        # BEFORE --ctrl so byte filth lands on top of whatever text
        # stands, and BEFORE the n_chars select so length stays true.
        k = F.col("doc_id")
        odd_ok = (k % 2 == 1) if hotkey else F.lit(True)
        docs = docs.withColumn(
            "text",
            F.when(
                (k % 109 == 57) & odd_ok,
                F.rtrim(
                    F.repeat(
                        F.concat(
                            F.element_at(
                                word_arr, (k % len(vocab)).cast("int") + 1
                            ),
                            F.lit(" "),
                        ),
                        30_000,
                    )
                ),
            )
            .when(
                (k % 331 == 131) & odd_ok,
                F.repeat(F.lit("qjxzvkwp"), 8192),  # 65536 chars, 1 token
            )
            .otherwise(F.col("text")),
        )
    if unicode_text:
        # r12 case-fold traps in the GROUP-KEY column (GNARLY covers the
        # text vocabulary; this covers keys that flow through upper()/
        # lower()): a deterministic slice of sources carries codepoints
        # where full (JVM) and simple (utf8proc) case mapping disagree.
        # Applied BEFORE --ctrl so its ' src5 ' byte-filth rule wins on
        # residue collision (the documented precedence convention). The
        # digit suffix stays so source-suffix parsers meet 'ß3'-style
        # unparseable-but-defined input (try_cast → NULL, both engines).
        k = F.col("doc_id")
        docs = docs.withColumn(
            "source",
            F.when(
                k % 79 == 37, F.concat(F.lit("srcß"), (k % 7).cast("string"))
            )
            .when(
                k % 83 == 41, F.concat(F.lit("srcﬁ"), (k % 5).cast("string"))
            )
            .when(
                k % 89 == 43, F.concat(F.lit("srcİ"), (k % 3).cast("string"))
            )
            .otherwise(F.col("source")),
        )
    if ctrl:
        # byte-level filth (module docstring) — warped BEFORE n_chars is
        # computed so length stays consistent with the dirty text; prime
        # moduli with non-zero residues so the rules never all stack on
        # doc_id 0 and never alias --extreme's %53==0 empty-doc rule
        k = F.col("doc_id")
        docs = docs.withColumn(
            "text",
            F.when(k % 47 == 5, F.lit("  \t "))  # whitespace-ONLY doc
            .when(  # untrimmed padding
                k % 53 == 19, F.concat(F.lit("  "), F.col("text"), F.lit(" \t"))
            )
            .when(  # CRLF line endings: every space becomes \r\n
                k % 59 == 23, F.regexp_replace("text", " ", "\r\n")
            )
            .when(  # embedded NUL bytes
                k % 61 == 13, F.concat(F.col("text"), F.lit("\x00null\x00"))
            )
            .when(  # zero-width space + RTL override + ZWJ
                k % 67 == 29,
                F.concat(
                    F.lit("\u200b\u202e"), F.col("text"), F.lit("\u200d")
                ),
            )
            .otherwise(F.col("text")),
        ).withColumn(
            # empty-STRING (not NULL) lang — the ''-vs-NULL distinction
            "lang",
            F.when(k % 71 == 19, F.lit("")).otherwise(F.col("lang")),
        ).withColumn(
            # group key with leading/trailing spaces: ' src5 ' != 'src5'
            "source",
            F.when(k % 73 == 31, F.lit(" src5 ")).otherwise(F.col("source")),
        )
    docs = docs.select(
        "doc_id", "text", "lang", "source",
        F.length("text").cast("long").alias("n_chars"),
    )
    write(docs, "documents", max(1, int(16 * sf / 0.1)))

    # embeddings: 64-dim, 10 Gaussian clusters with UNEQUAL sizes
    # (rand^2 -> cluster 0 holds ~30%) and per-cluster spread
    write(
        spark.range(n_emb).select(
            F.col("id").alias("vec_id"),
            (
                F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(
                    F.floor(F.pow(F.rand(SEED + 38), 2.0) * 10)
                )
                if hotkey
                else F.floor(F.pow(F.rand(SEED + 38), 2.0) * 10)
            )
            .cast("int")
            .alias("label"),
        ).select(
            "vec_id", "label",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                # --dupes: every third row drops its per-row term, so rows
                # of the same label become EXACT duplicate vectors (cosine
                # ties, zero distances, dedup clusters of identical points)
                # --extreme: ~1-in-37/41/43 vectors carry one NaN / +Inf /
                # -Inf component at a vec_id-determined dimension — dot
                # products, norms, and moment partials meet non-finite
                # floats a real upstream encoder occasionally emits
                lambda i: F.when(
                    F.lit(extreme)
                    & (F.col("vec_id") % 37 == 0)
                    & (i == F.col("vec_id") % 64),
                    F.lit(float("nan")),
                )
                .when(
                    F.lit(extreme)
                    & (F.col("vec_id") % 41 == 0)
                    & (i == (F.col("vec_id") * 7) % 64),
                    F.lit(float("inf")),
                )
                .when(
                    F.lit(extreme)
                    & (F.col("vec_id") % 43 == 0)
                    & (i == (F.col("vec_id") * 11) % 64),
                    F.lit(float("-inf")),
                )
                .otherwise(
                    F.sin(F.col("label") * 13 + i * 7) * 2.0
                    + F.when(
                        F.lit(dupes) & (F.col("vec_id") % 3 == 0),
                        F.lit(0.0),
                    )
                    # --hotkey: the hot half's per-row term shrinks 600x —
                    # cosine ~1 near-duplicates, one hot hyperplane bucket
                    .when(
                        F.lit(hotkey) & (F.col("vec_id") % 2 == 0),
                        F.sin(F.col("vec_id") * 31 + i * 3) * 0.001,
                    )
                    .otherwise(
                        F.sin(F.col("vec_id") * 31 + i * 3) * 0.6
                    )
                )
                .cast("float"),
            ).alias("embedding"),
        ).select("vec_id", "embedding", "label"),
        "embeddings", 4,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--nulls", action="store_true")
    ap.add_argument("--unicode", action="store_true")
    ap.add_argument("--empty", action="store_true")
    ap.add_argument("--dupes", action="store_true")
    ap.add_argument("--extreme", action="store_true")
    ap.add_argument("--dates", action="store_true")
    ap.add_argument("--negative", action="store_true")
    ap.add_argument("--hotkey", action="store_true")
    ap.add_argument("--bigid", action="store_true")
    ap.add_argument("--ctrl", action="store_true")
    ap.add_argument("--nullkey", action="store_true")
    ap.add_argument("--rowdup", action="store_true")
    ap.add_argument("--manyfiles", action="store_true")
    ap.add_argument("--longtext", action="store_true")
    ap.add_argument("--evolve", action="store_true")
    ap.add_argument("--filedirt", action="store_true")
    ap.add_argument("--tz", action="store_true")
    ap.add_argument("--conflict", action="store_true")
    args = ap.parse_args()

    from json_parquet_convertor_spark.session import get_spark

    # variant-suffixed default dir: a --nulls/--unicode set must never be
    # mistaken for the plain one by a consumer's exists-check (probe reuse)
    suffix = ("_nulls" if args.nulls else "") + (
        "_unicode" if args.unicode else ""
    ) + ("_empty" if args.empty else "") + (
        "_dupes" if args.dupes else ""
    ) + ("_extreme" if args.extreme else "") + (
        "_dates" if args.dates else ""
    ) + ("_negative" if args.negative else "") + (
        "_hotkey" if args.hotkey else ""
    ) + ("_bigid" if args.bigid else "") + ("_ctrl" if args.ctrl else "") + (
        "_nullkey" if args.nullkey else ""
    ) + ("_rowdup" if args.rowdup else "") + (
        "_manyfiles" if args.manyfiles else ""
    ) + ("_longtext" if args.longtext else "") + (
        "_evolve" if args.evolve else ""
    ) + ("_filedirt" if args.filedirt else "") + (
        "_tz" if args.tz else ""
    ) + ("_conflict" if args.conflict else "")
    dst = args.out or os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"jpc_genfix_sf{args.sf}{suffix}"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or 32
    spark = get_spark(app_name="jpc-gen-fixtures", cpus=cpus)
    build(spark, dst, args.sf, nulls=args.nulls,
          unicode_text=args.unicode, empty=args.empty, dupes=args.dupes,
          extreme=args.extreme, dates=args.dates, negative=args.negative,
          hotkey=args.hotkey, bigid=args.bigid, ctrl=args.ctrl,
          nullkey_on=args.nullkey, rowdup=args.rowdup,
          manyfiles=args.manyfiles, longtext=args.longtext,
          evolve=args.evolve, filedirt=args.filedirt, tz_on=args.tz,
          conflict=args.conflict)
    print(dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
