/* Pure-C consumer of the lewton_tpu C ABI: .ogg file -> .wav, no Python.
 *
 * Demonstrates the full C story (the reference's capi consumers are
 * ffmpeg-style clients feeding Matroska extradata + raw packets,
 * lewton src/capi.rs:79-147):
 *   1. demux the Ogg container with lt_ogg_* (liblewton_host's own
 *      demuxer — a real client inside Matroska would already have raw
 *      packets and skip this step),
 *   2. build xiph-laced extradata from the three header packets,
 *   3. decode every audio packet via lewton_decode_packet,
 *   4. interleave planar f32 -> s16le and write a WAV.
 *
 * Build + run (from the repo root):
 *   make -C lewton_tpu/native
 *   cc -O2 examples/capi_demo.c -Ilewton_tpu/native \
 *      -Llewton_tpu/native -llewton_host -lm -o /tmp/capi_demo
 *   LD_LIBRARY_PATH=lewton_tpu/native /tmp/capi_demo in.ogg out.wav
 */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "lewton_tpu.h"

/* Frame-level exports from the same library (not part of the stable
 * lewton-compatible subset in lewton_tpu.h, so declared here). */
typedef struct LtOgg LtOgg;
LtOgg *lt_ogg_new(const uint8_t *data, size_t len);
void lt_ogg_free(LtOgg *r);
int64_t lt_ogg_packet_count(const LtOgg *r);
void lt_ogg_packet_meta(const LtOgg *r, uint64_t *lens, uint32_t *serials,
                        uint8_t *flags, uint64_t *absgp, uint64_t *pg);
void lt_ogg_packet_data(const LtOgg *r, uint8_t *out);

static void *xmalloc(size_t n) {
  void *p = malloc(n);
  if (!p) {
    fprintf(stderr, "out of memory (%zu bytes)\n", n);
    exit(1);
  }
  return p;
}

static uint8_t *read_file(const char *path, size_t *len_out) {
  FILE *f = fopen(path, "rb");
  if (!f) return NULL;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  if (n < 0) { /* non-seekable input */
    fclose(f);
    return NULL;
  }
  fseek(f, 0, SEEK_SET);
  uint8_t *buf = xmalloc((size_t)n);
  if (fread(buf, 1, (size_t)n, f) != (size_t)n) {
    fclose(f);
    free(buf);
    return NULL;
  }
  fclose(f);
  *len_out = (size_t)n;
  return buf;
}

/* Matroska/xiph extradata: count byte (2), xiph-laced lengths of the
 * first two packets (255-run + remainder), then the three packets. */
static uint8_t *make_extradata(const uint8_t *p0, size_t n0,
                               const uint8_t *p1, size_t n1,
                               const uint8_t *p2, size_t n2, size_t *out_n) {
  size_t lace = n0 / 255 + 1 + n1 / 255 + 1;
  uint8_t *x = xmalloc(1 + lace + n0 + n1 + n2), *w = x;
  *w++ = 2;
  for (size_t k = n0; ; k -= 255) { *w++ = k >= 255 ? 255 : (uint8_t)k; if (k < 255) break; }
  for (size_t k = n1; ; k -= 255) { *w++ = k >= 255 ? 255 : (uint8_t)k; if (k < 255) break; }
  memcpy(w, p0, n0); w += n0;
  memcpy(w, p1, n1); w += n1;
  memcpy(w, p2, n2); w += n2;
  *out_n = (size_t)(w - x);
  return x;
}

static void wav_header(FILE *f, uint32_t rate, uint16_t ch, uint32_t nsamp) {
  uint32_t data_bytes = nsamp * ch * 2, chunk = 36 + data_bytes;
  uint32_t byte_rate = rate * ch * 2;
  uint16_t block = ch * 2, fmt = 1, bits = 16;
  uint32_t fmt_len = 16;
  fwrite("RIFF", 1, 4, f); fwrite(&chunk, 4, 1, f);
  fwrite("WAVEfmt ", 1, 8, f); fwrite(&fmt_len, 4, 1, f);
  fwrite(&fmt, 2, 1, f); fwrite(&ch, 2, 1, f);
  fwrite(&rate, 4, 1, f); fwrite(&byte_rate, 4, 1, f);
  fwrite(&block, 2, 1, f); fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f); fwrite(&data_bytes, 4, 1, f);
}

int main(int argc, char **argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s in.ogg out.wav\n", argv[0]);
    return 2;
  }
  size_t ogg_len;
  uint8_t *ogg = read_file(argv[1], &ogg_len);
  if (!ogg) { perror(argv[1]); return 1; }

  LtOgg *demux = lt_ogg_new(ogg, ogg_len);
  if (!demux) { fprintf(stderr, "bad ogg container\n"); return 1; }
  int64_t n = lt_ogg_packet_count(demux);
  if (n < 4) { fprintf(stderr, "need headers + audio\n"); return 1; }
  uint64_t *lens = xmalloc((size_t)n * 8), *absgp = xmalloc((size_t)n * 8);
  uint64_t *pg = xmalloc((size_t)n * 8);
  uint32_t *serials = xmalloc((size_t)n * 4);
  uint8_t *flags = xmalloc((size_t)n);
  lt_ogg_packet_meta(demux, lens, serials, flags, absgp, pg);
  size_t total = 0;
  for (int64_t i = 0; i < n; ++i) total += lens[i];
  uint8_t *pool = xmalloc(total);
  lt_ogg_packet_data(demux, pool);
  uint8_t **pck = xmalloc((size_t)n * sizeof *pck);
  for (int64_t i = 0, off = 0; i < n; off += (int64_t)lens[i++])
    pck[i] = pool + off;

  size_t xn;
  uint8_t *extra = make_extradata(pck[0], lens[0], pck[1], lens[1],
                                  pck[2], lens[2], &xn);
  LewtonContext *ctx = lewton_context_from_extradata(extra, xn);
  if (!ctx) { fprintf(stderr, "bad vorbis headers\n"); return 1; }
  /* sample rate from the ident header (LE u32 at byte 12) */
  uint32_t rate;
  memcpy(&rate, pck[0] + 12, 4);

  FILE *out = fopen(argv[2], "wb");
  if (!out) { perror(argv[2]); return 1; }
  wav_header(out, rate, 2, 0); /* patched below once counts are known */

  uint32_t nsamp = 0;
  uint16_t channels = 0;
  for (int64_t i = 3; i < n; ++i) {
    LewtonSamples *s = NULL;
    if (lewton_decode_packet(ctx, pck[i], lens[i], &s) != 0)
      continue; /* malformed packet: skip, keep the stream going */
    size_t cnt = lewton_samples_count(s);
    size_t ch = lewton_samples_channels(s);
    channels = (uint16_t)ch;
    if (cnt) {
      int16_t *row = xmalloc(cnt * ch * 2);
      for (size_t c = 0; c < ch; ++c) {
        const float *src = lewton_samples_f32(s, c);
        for (size_t j = 0; j < cnt; ++j) {
          float v = src[j] * 32768.0f;
          if (v > 32767.f) v = 32767.f;
          if (v < -32768.f) v = -32768.f;
          row[j * ch + c] = (int16_t)lrintf(v);
        }
      }
      fwrite(row, 2, cnt * ch, out);
      free(row);
      nsamp += (uint32_t)cnt;
    }
    lewton_samples_drop(s);
  }
  if (channels == 0) { /* nothing decoded: don't emit a 0-channel WAV */
    fclose(out);
    remove(argv[2]);
    fprintf(stderr, "no decodable audio packets\n");
    return 1;
  }
  /* back-patch the WAV sizes now that the sample count is known */
  fseek(out, 0, SEEK_SET);
  wav_header(out, rate, channels, nsamp);
  fclose(out);
  printf("decoded %u samples x %u ch at %u Hz -> %s\n", nsamp, channels,
         rate, argv[2]);

  lewton_context_drop(ctx);
  lt_ogg_free(demux);
  free(extra); free(pck); free(pool); free(flags);
  free(serials); free(pg); free(absgp); free(lens); free(ogg);
  return 0;
}
