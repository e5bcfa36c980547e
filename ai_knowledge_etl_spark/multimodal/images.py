"""Image pipeline over binary columns (reference: commands/extract.md:470-546,
scripts/compress-image.mjs:49-97, agents/image-analyzer.md).

Everything metadata-shaped (magic-byte validation, size gates, fallback-tier
selection, categorization) is pure column expressions on the BinaryType
column — JVM-side, no decode needed. Actual pixel work (PIL/ffmpeg) is
import-gated: absent the library, `decode_image` raises NotImplementedError
and the deterministic stubs keep the pipeline testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_knowledge_etl_spark import config

# magic-byte prefixes, hex (reference: commands/extract.md:538-546 verifies
# downloaded bytes before use)
MAGIC = {
    "png": "89504E47",
    "jpeg": "FFD8FF",
    "gif": "47494638",
    "webp": "52494646",
}

IMAGE_CATEGORIES = (
    "architecture_diagram",
    "flowchart",
    "screenshot",
    "chart",
    "table_image",
    "code_snippet",
    "photo",
    "decorative",
)


def scan_images(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile scan → (path, modificationTime, length, content binary)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )


def image_format(content: Column | str) -> Column:
    """Sniff format from magic bytes — pure column expr over binary."""
    c = F.col(content) if isinstance(content, str) else content
    h = F.upper(F.hex(F.substring(c, 1, 4)))
    expr = F.lit("invalid")
    for fmt, magic in reversed(list(MAGIC.items())):
        expr = F.when(h.startswith(magic), F.lit(fmt)).otherwise(expr)
    return expr


def is_valid_image(content: Column | str) -> Column:
    return image_format(content) != "invalid"


def classify_image_stub(content: Column | str) -> Column:
    """Deterministic 8-class categorization stub (reference:
    DESIGN.md:1133-1141): md5 of the hex-encoded bytes → category. A
    vision-model pandas UDF slots behind the same (binary → category
    string) signature. md5-over-hex (not crc32) so the DuckDB oracle can
    evaluate the identical function: hex(blob) is uppercase in both
    engines and md5 of that string is engine-independent."""
    c = F.col(content) if isinstance(content, str) else content
    idx = F.conv(F.substring(F.md5(F.hex(c)), 1, 2), 16, 10).cast("int") % len(
        IMAGE_CATEGORIES
    )
    expr = F.lit(IMAGE_CATEGORIES[0])
    for i, cat in list(enumerate(IMAGE_CATEGORIES))[1:]:
        expr = F.when(idx == i, F.lit(cat)).otherwise(expr)
    return expr


def compress_tier(length: Column | str) -> Column:
    """Fallback-chain tier selection 800→640→480→400 px (reference:
    compress-image.mjs:49-97, content-safeguard limits.yaml:4-9): pick the
    first tier whose projected size fits the 100 KB target (300 KB fallback).
    Deterministic size model: projected = length / (800/tier)^2."""
    n = (F.col(length) if isinstance(length, str) else length).cast("double")
    tiers = (800, 640, 480, 400)
    expr = F.lit(0)  # 0 = give up → SKIP strategy
    for t in reversed(tiers):
        projected = n * (t * t) / (800.0 * 800.0)
        expr = F.when(
            projected <= 100_000, F.lit(t)
        ).otherwise(expr)
    # last-chance 300 KB cap at the smallest tier
    expr = F.when(
        (expr == 0) & (n * (400.0 * 400.0) / (800.0 * 800.0) <= 300_000),
        F.lit(400),
    ).otherwise(expr)
    return expr.cast("int")


def describe_images_stub(
    images: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """Anti-fabrication describe (reference: image-analyzer.md:193-240):
    valid images get a deterministic structural description; invalid bytes
    get an ERROR RECORD — never a made-up description. mapInPandas so a
    model batch-inference kernel can drop in with the same schema."""
    schema = f"{path_col} string, description string, error string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "description": [], "error": []}
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                out["path"].append(path)
                raw = bytes(blob) if blob is not None else b""
                fmt = next(
                    (
                        f
                        for f, m in MAGIC.items()
                        if raw[:4].hex().upper().startswith(m[:8])
                    ),
                    None,
                )
                if fmt is None:
                    out["description"].append(None)
                    out["error"].append("E003: unreadable image (bad magic)")
                else:
                    out["description"].append(
                        f"[{fmt} image, {len(raw)} bytes]"
                    )
                    out["error"].append(None)
            yield pd.DataFrame(out)

    return images.select(path_col, content_col).mapInPandas(gen, schema)


def _probe_pil() -> bool:
    """Session-start probe (VERDICT r1 #9): True iff a real pixel decoder is
    importable. Tests key off this so the real-bytes compression-chain test
    runs whenever the environment gains pillow, and auto-skips otherwise."""
    try:
        from PIL import Image  # type: ignore # noqa: F401

        return True
    except ImportError:
        return False


HAS_PIL = _probe_pil()


def decode_image(content: bytes) -> "object":
    """Pixel decode — requires an imaging library this container does not
    ship. The pipeline's metadata path never needs it; plug PIL in here."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as e:
        raise NotImplementedError(
            "pixel decode needs PIL/pillow (not available in this container); "
            "metadata-level operators (validation, tiering, categorization) "
            "work without it"
        ) from e


def resize_to_tier(content: bytes, tier: int) -> bytes:
    """Real re-encode of one image at a tier width (reference:
    compress-image.mjs:49-97 — sharp resize→jpeg). Backend selection:
    PIL when importable (any input format); otherwise vendored
    pure-Python codecs — minipng (PNG) or minijpeg (baseline JPEG) to
    decode, nearest-neighbor resize. EITHER WAY the output is a REAL
    lossy baseline JPEG at q80 (minijpeg.encode_jpeg in-container), so
    the tier walk shrinks genuine compressed byte sizes exactly like the
    reference's sharp→jpeg chain (round-7 verdict #4; the old no-PIL
    path re-emitted lossless PNG, so sizes never dropped with quality).
    Unsupported input bytes raise — `compress_images_real` converts that
    to an error record."""
    import io

    if HAS_PIL:
        img = decode_image(content)
        img = img.convert("RGB")
        w, h = img.size
        if w > tier:
            img = img.resize((tier, max(1, int(h * tier / w))))
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=80)
        return buf.getvalue()
    from ai_knowledge_etl_spark.multimodal import minijpeg, minipng

    if content[:8] == minipng.MAGIC:
        w, h, rgb = minipng.decode_png(content)
        rgb = bytes(rgb)
    elif content[:3] == minijpeg.MAGIC:
        w, h, rgb = minijpeg.decode_jpeg(content)
    else:
        raise NotImplementedError(
            "only PNG/baseline-JPEG decode in-container (PIL not available)"
        )
    if w > tier:
        w, h, rgb = minipng.resize_nearest(w, h, rgb, tier)
        rgb = bytes(rgb)
    return minijpeg.encode_jpeg(w, h, rgb, quality=80)


def render_compress_card(i: int) -> bytes:
    """Deterministic probe image #i for the REAL compression ladder
    (udf-compress-image-real): PNG bytes whose content class drives a
    different path through the 800→640→480→400 walk —

      i % 5 == 0  md5-noise 560×280: JPEG-incompressible, fits only
                  after real resizes at the 480/400 tiers
      i % 5 == 1  md5-noise 900×200: wider than every tier, every step
                  is a genuine resize+re-encode; fits mid-ladder
      i % 5 == 2  smooth gradient 1600×400: big but compressible — the
                  first tier's re-encode already fits
      i % 5 == 3  md5-noise 120×90: small, fits immediately
      i % 5 == 4  garbage bytes (bad magic) → E003 error row

    Noise pixels are md5("card:{i}:{block}") streams — identical in the
    driver (oracle builder) and every executor."""
    import hashlib

    from ai_knowledge_etl_spark.multimodal import minipng

    kind = i % 5
    if kind == 4:
        return b"NOT_AN_IMAGE_" + str(i).encode()
    if kind == 2:
        w, h = 1600, 400
        import numpy as np

        x = np.arange(w, dtype=np.uint16)
        y = np.arange(h, dtype=np.uint16)
        r = ((x[None, :] + y[:, None]) % 256).astype(np.uint8)
        g = np.broadcast_to((x % 256).astype(np.uint8), (h, w))
        b = np.broadcast_to((y % 256).astype(np.uint8)[:, None], (h, w))
        rgb = np.stack([r, g, b], axis=-1).tobytes()
        return minipng.encode_png(w, h, rgb)
    w, h = {0: (560, 280), 1: (900, 200), 3: (120, 90)}[kind]
    n = 3 * w * h
    chunks = []
    for blk in range((n + 15) // 16):
        chunks.append(hashlib.md5(f"card:{i}:{blk}".encode()).digest())
    return minipng.encode_png(w, h, b"".join(chunks)[:n])


def walk_tiers(raw: bytes) -> tuple[int | None, bytes | None, str | None]:
    """The fallback-chain walk for ONE image's bytes: (tier, compressed,
    error) — exactly one of compressed/error is set unless every tier
    overflows (tier 0). Pure function shared by the distributed kernel
    (compress_images_real) and the driver-side oracle builder for
    udf-compress-image-real, so the differential proves the Arrow/
    binary-column plumbing reproduces the sequential walk bit-for-bit."""
    try:
        chosen, best = 0, None
        decoded = None  # (w, h, rgb) — decode once, reuse per tier
        prev_eff = None  # effective width of the previous attempt
        for t in (800, 640, 480, 400):
            if HAS_PIL:
                best = resize_to_tier(raw, t)
            else:
                # Round-11 cut, output-identical: decode the source ONCE
                # (the per-tier resize_to_tier call re-decoded it every
                # attempt), and skip the encode entirely when this
                # tier's effective width equals the previous attempt's —
                # a no-op resize feeds the encoder the IDENTICAL pixels,
                # so the previous result is already the answer (the
                # 560-wide noise card re-encoded its full frame at both
                # the 800 and 640 tiers, ~35% of its walk).
                from ai_knowledge_etl_spark.multimodal import (
                    minijpeg,
                    minipng,
                )

                if decoded is None:
                    if raw[:8] == minipng.MAGIC:
                        w0, h0, rgb0 = minipng.decode_png(raw)
                        decoded = (w0, h0, bytes(rgb0))
                    elif raw[:3] == minijpeg.MAGIC:
                        decoded = minijpeg.decode_jpeg(raw)
                    else:
                        raise NotImplementedError(
                            "only PNG/baseline-JPEG decode in-container "
                            "(PIL not available)"
                        )
                w0, h0, rgb0 = decoded
                eff = t if w0 > t else w0
                if prev_eff is not None and eff == prev_eff:
                    continue  # identical input ⇒ identical bytes
                prev_eff = eff
                if w0 > t:
                    w1, h1, rgb1 = minipng.resize_nearest(w0, h0, rgb0, t)
                    rgb1 = bytes(rgb1)
                else:
                    w1, h1, rgb1 = w0, h0, rgb0
                best = minijpeg.encode_jpeg(w1, h1, rgb1, quality=80)
            if len(best) <= 100_000:
                chosen = t
                break
        if chosen == 0 and best is not None and len(best) <= 300_000:
            chosen = 400  # last-chance 300 KB cap
        if chosen == 0:
            return 0, None, "E005: exceeds 300KB at min tier"
        return chosen, best, None
    except Exception as e:  # undecodable bytes → error record
        return None, None, f"E003: {type(e).__name__}"


N_COMPRESS_CARDS = 10  # one full cycle of the 5 card kinds, twice


def compress_cards_real(ids: DataFrame, id_col: str = "img_id") -> DataFrame:
    """(img_id) → the REAL lossy compression ladder's outcome for the
    deterministic probe card of that id: (img_id, tier, out_bytes,
    magic_hex, error). Renders the card bytes AND walks the
    800→640→480→400 tier chain with genuine minijpeg q80 re-encodes
    inside an Arrow-batched mapInPandas kernel — the executors run the
    byte-level codec, the oracle (driver-side replay of walk_tiers baked
    into a VALUES table) pins every encoded size and the JPEG magic.
    Scale: embarrassingly parallel per image, no shuffle; a PIL/sharp
    kernel drops into resize_to_tier without touching this plumbing."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "img_id": [], "tier": [], "out_bytes": [],
                "magic_hex": [], "error": [],
            }
            for i in pdf[id_col]:
                i = int(i)
                tier, best, err = walk_tiers(render_compress_card(i))
                out["img_id"].append(i)
                out["tier"].append(tier)
                out["out_bytes"].append(
                    len(best) if best is not None else None
                )
                out["magic_hex"].append(
                    best[:3].hex() if best is not None else None
                )
                out["error"].append(err)
            yield pd.DataFrame(out)

    return ids.select(id_col).mapInPandas(
        gen,
        "img_id long, tier int, out_bytes int, magic_hex string, "
        "error string",
    )


def compress_images_real(
    images: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """Distributed fallback-chain compression on REAL pixels (reference:
    compress-image.mjs:49-97 + limits.yaml:80-84): walk tiers 800→640→480→400
    until the re-encoded size fits 100 KB (300 KB last-chance), error-as-data
    for undecodable bytes. Arrow-batched mapInPandas; the per-row kernel is
    `resize_to_tier`, which uses PIL when importable and the vendored
    minipng backend (PNG-only, pure Python) otherwise — so the chain runs
    on real bytes in this container too; non-PNG inputs without PIL
    surface as E003 error records rather than a job failure."""
    schema = (
        f"{path_col} string, tier int, out_bytes int, compressed binary, "
        "error string"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "path": [], "tier": [], "out_bytes": [],
                "compressed": [], "error": [],
            }
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                out["path"].append(path)
                raw = bytes(blob) if blob is not None else b""
                tier, best, err = walk_tiers(raw)
                out["tier"].append(tier)
                out["out_bytes"].append(len(best) if best is not None else None)
                out["compressed"].append(best)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return images.select(path_col, content_col).mapInPandas(gen, schema)


def curate_cards_real(
    ids: DataFrame, id_col: str = "img_id", n_cards: int = N_COMPRESS_CARDS
) -> DataFrame:
    """The per-image stage of pipeline-image-curate-real: each img_id maps
    onto probe card `img_id % n_cards` (so the population carries planted
    EXACT duplicates — every card appears once per n_cards ids), renders
    it, and walks the REAL 800→640→480→400 JPEG ladder (walk_tiers, the
    same pure function the driver-side oracle replays). Emits the
    encoded output's md5 so downstream exact dedup runs on genuine lossy
    bytes, not a size model: (img_id, tier, out_bytes, out_md5, error).
    Scale: embarrassingly parallel per image, no shuffle; the dedup that
    consumes out_md5 is one hash aggregate."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "img_id": [], "tier": [], "out_bytes": [],
                "out_md5": [], "error": [],
            }
            for i in pdf[id_col]:
                i = int(i)
                tier, best, err = walk_tiers(
                    render_compress_card(i % n_cards)
                )
                out["img_id"].append(i)
                out["tier"].append(tier)
                out["out_bytes"].append(
                    len(best) if best is not None else None
                )
                out["out_md5"].append(
                    hashlib.md5(best).hexdigest() if best is not None
                    else None
                )
                out["error"].append(err)
            yield pd.DataFrame(out)

    return ids.select(id_col).mapInPandas(
        gen,
        "img_id long, tier int, out_bytes int, out_md5 string, "
        "error string",
    )


def phash_images(ids: DataFrame, id_col: str = "img_id") -> DataFrame:
    """Perceptual (average) hash over REAL PNG bytes: for each id, build
    the deterministic 8x8 RGB test card (the arithmetic the oracle
    replays), push it through the ACTUAL codec — minipng.encode_png then
    decode_png, so a lossy or misaligned round-trip breaks the hash —
    gray = (299r + 587g + 114b)//1000, bit p = gray_p*64 > sum(gray)
    (integer cross-multiply, no float mean), packed into four 16-bit
    bands h0..h3 (BIGINT-safe; bands double as the Hamming-LSH keys).
    ids >= 10^12 are the planted near-duplicates of id-10^12 (the clone-id offset must exceed ANY corpus id — a +100k offset collided with real doc_ids at the 100x sweep and merged two images' pixels under one id): +16 on
    every 9th red channel — a few gray values shift ~5 units, so only
    bits near the mean flip and the clone stays within a small Hamming
    radius of its source. Arrow-batched mapInPandas; the per-row work is
    a 192-byte codec round trip."""
    from collections.abc import Iterator

    from ai_knowledge_etl_spark.multimodal import minipng

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"img_id": [], "h0": [], "h1": [], "h2": [], "h3": []}
            for i in pdf[id_col]:
                i = int(i)
                base, pert = i % 10**12, i >= 10**12
                import hashlib

                rgb = bytearray()
                for p in range(64):
                    hx = hashlib.md5(f"{base}:{p}".encode()).hexdigest()
                    r = int(hx[0:2], 16)
                    if pert and p % 9 == 0:
                        r = (r + 16) % 256
                    rgb.append(r)
                    rgb.append(int(hx[2:4], 16))
                    rgb.append(int(hx[4:6], 16))
                png = minipng.encode_png(8, 8, bytes(rgb))
                _, _, px = minipng.decode_png(png)
                grays = [
                    (px[3 * p] * 299 + px[3 * p + 1] * 587 + px[3 * p + 2] * 114)
                    // 1000
                    for p in range(64)
                ]
                s = sum(grays)
                bands = [0, 0, 0, 0]
                for p, gv in enumerate(grays):
                    if gv * 64 > s:
                        bands[p // 16] |= 1 << (p % 16)
                out["img_id"].append(i)
                for k in range(4):
                    out[f"h{k}"].append(bands[k])
            yield pd.DataFrame(out)

    return ids.select(id_col).mapInPandas(
        gen, "img_id long, h0 long, h1 long, h2 long, h3 long"
    )


def render_cards(
    ids: DataFrame, id_col: str = "img_id", garbage_mod: int | None = None
) -> DataFrame:
    """(id) → (id, content binary): REAL PNG bytes of the deterministic
    md5-mixed 8x8 test card (the same arithmetic phash_images and the
    oracles replay). ids >= 10^12 render the perturbed near-duplicate of
    id-10^12. With `garbage_mod`, ids whose BASE % garbage_mod == 0 emit
    non-PNG bytes instead — the invalid-magic true positives for
    validation routing."""
    import hashlib
    from collections.abc import Iterator

    from ai_knowledge_etl_spark.multimodal import minipng

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"img_id": [], "content": []}
            for i in pdf[id_col]:
                i = int(i)
                base, pert = i % 10**12, i >= 10**12
                out["img_id"].append(i)
                if garbage_mod is not None and base % garbage_mod == 0:
                    out["content"].append(f"not a png {base}".encode())
                    continue
                rgb = bytearray()
                for p in range(64):
                    hx = hashlib.md5(f"{base}:{p}".encode()).hexdigest()
                    r = int(hx[0:2], 16)
                    if pert and p % 9 == 0:
                        r = (r + 16) % 256
                    rgb.append(r)
                    rgb.append(int(hx[2:4], 16))
                    rgb.append(int(hx[4:6], 16))
                out["content"].append(minipng.encode_png(8, 8, bytes(rgb)))
            yield pd.DataFrame(out)

    return ids.select(id_col).mapInPandas(
        gen, f"{id_col} long, content binary"
    )


def phash_bytes(
    images: DataFrame, id_col: str = "img_id", content_col: str = "content"
) -> DataFrame:
    """(id, content binary) → (id, h0..h3): decode the PNG with the real
    codec and average-hash the DECODED pixels (same hash layout as
    phash_images — four 16-bit bands, integer-only threshold). Rows whose
    bytes fail to decode are dropped (callers route invalid magic before
    hashing; see models.classify_images for the same contract)."""
    from collections.abc import Iterator

    from ai_knowledge_etl_spark.multimodal import minipng

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"img_id": [], "h0": [], "h1": [], "h2": [], "h3": []}
            for i, raw in zip(pdf[id_col], pdf[content_col]):
                try:
                    w, h, px = minipng.decode_png(bytes(raw))
                except Exception:
                    continue
                n = w * h
                if n > 252:
                    # Four signed-int64 bands hold 63 usable bits each =
                    # 252 bits max; a real pipeline downsamples (resize
                    # seam) to ~8x8 BEFORE hashing — refusing here is the
                    # honest failure, not a silently-degraded hash.
                    raise ValueError(
                        f"phash needs <=252 pixels (got {w}x{h}); "
                        "downsample first"
                    )
                grays = [
                    (px[3 * p] * 299 + px[3 * p + 1] * 587 + px[3 * p + 2] * 114)
                    // 1000
                    for p in range(n)
                ]
                s = sum(grays)
                bands = [0, 0, 0, 0]
                # Bit position = rank of p WITHIN its band (not p % 16,
                # which collides for n != 64): collision-free for any
                # n <= 256, and identical to p % 16 at the 8x8 fixture
                # size, so the DuckDB oracle arithmetic is unchanged.
                ranks = [0, 0, 0, 0]
                for p, gv in enumerate(grays):
                    band = (p * 4) // n
                    if gv * n > s:
                        bands[band] |= 1 << ranks[band]
                    ranks[band] += 1
                out["img_id"].append(int(i))
                for k in range(4):
                    out[f"h{k}"].append(bands[k])
            yield pd.DataFrame(out)

    return images.select(id_col, content_col).mapInPandas(
        gen, "img_id long, h0 long, h1 long, h2 long, h3 long"
    )


def phash_pairs(hs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate pairs from a (img_id, h0..h3) hash table via
    Hamming-LSH: candidates share at least one exact 16-bit band (equi
    self-join on (band_idx, band_value) — never all-pairs), then the full
    Hamming distance (bit_count of per-band XORs) gates at max_hamming.
    Returns (img_a, img_b, hamming) with img_a < img_b, each pair once."""
    bands = None
    for bi in range(4):
        part = hs.select(
            "img_id", F.lit(bi).alias("bi"), F.col(f"h{bi}").alias("bv")
        )
        bands = part if bands is None else bands.unionByName(part)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .select(
            F.col("a.img_id").alias("img_a"), F.col("b.img_id").alias("img_b")
        )
        .distinct()
    )
    x, y = hs.alias("x"), hs.alias("y")
    scored = (
        cand.join(x, F.col("img_a") == F.col("x.img_id"))
        .join(y, F.col("img_b") == F.col("y.img_id"))
        .select(
            "img_a",
            "img_b",
            (
                F.bit_count(F.col("x.h0").bitwiseXOR(F.col("y.h0")))
                + F.bit_count(F.col("x.h1").bitwiseXOR(F.col("y.h1")))
                + F.bit_count(F.col("x.h2").bitwiseXOR(F.col("y.h2")))
                + F.bit_count(F.col("x.h3").bitwiseXOR(F.col("y.h3")))
            ).cast("int").alias("hamming"),
        )
    )
    return scored.where(F.col("hamming") <= max_hamming)
