/* tap_argosp.c — oracle driver for the ARGOS *realtime* variant
 * (ARGOSdemodPortAudio), file-driven (test harness only).
 *
 * Links the REFERENCE DSP library plus ARGOSdemodPortAudio/ByteSync.c (the
 * framer copy with inverse-sync detection ENABLED at ByteSync.c:112) and runs
 * the exact chain of ARGOSdemodPortAudio/main.c:266-336 — float32 config.h,
 * StaticGain desired level 1, PLL ±550 Hz acq==trk 16 rad/s, LPF 700 Hz /
 * 50 taps, AGC, squelch 0.15, Gardner 800 baud, Manchester 0.5, 13-bit sync —
 * but pulls chunks from a wav file instead of PortAudio, so synthetic golden
 * recordings can be decoded deterministically for parity tests.
 *
 * This file is original test-harness code; the DSP blocks themselves are the
 * unmodified reference objects.
 */
#include <complex.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "wave.h"
#include "AGC.h"
#include "CarrierTrackPLL.h"
#include "LowPassFilter.h"
#include "GardenerClockRecovery.h"
#include "ManchesterDecode.h"

/* ARGOSdemodPortAudio/main.c parameter block (lines 38-69) */
#define MAX_DEV      550.0
#define PLL_THRESH   0.1
#define PLL_LOCKA    3.1831
#define PLL_ACQ      16.0
#define PLL_TRK      16.0
#define SQLCH        0.15
#define AGC_ATK      79.5775
#define AGC_DCY      159.1549
#define LPF_FC       700.0
#define LPF_ORDER    50
#define GDNR_LIM     0.1
#define GDNR_GAIN    3.0
#define BAUD         (400 * 2.0)
#define RESYNC       0.5

int FindSyncWords(unsigned char *bitStreamIn, DECIMAL_TYPE *bitStreamInTime,
                  unsigned long nSamples, char *syncWord,
                  unsigned int syncWordLength, FILE *packetFile);

int main(int argc, char **argv) {
  if (argc < 3) { fprintf(stderr, "usage: tap_argosp in.wav out.txt [chunkSize]\n"); return 1; }
  unsigned long chunkSize = argc > 3 ? strtoul(argv[3], 0, 10) : 2400;

  FILE *in = fopen(argv[1], "rb");
  if (!in) { perror(argv[1]); return 1; }
  FILE *out = fopen(argv[2], "w");
  if (!out) { perror(argv[2]); return 1; }
  HEADER header = ReadWavHeader(in);
  DECIMAL_TYPE Fs = (DECIMAL_TYPE)header.sample_rate;

  DECIMAL_TYPE complex *wave = malloc(sizeof(*wave) * chunkSize);
  DECIMAL_TYPE *wtime = malloc(sizeof(DECIMAL_TYPE) * chunkSize);
  DECIMAL_TYPE *real = malloc(sizeof(DECIMAL_TYPE) * chunkSize);
  DECIMAL_TYPE *lock = malloc(sizeof(DECIMAL_TYPE) * chunkSize);
  DECIMAL_TYPE *sym = malloc(sizeof(DECIMAL_TYPE) * chunkSize);
  unsigned char *bits = malloc(chunkSize);
  DECIMAL_TYPE *coef = malloc(sizeof(DECIMAL_TYPE) * LPF_ORDER);
  MakeLPFIR(coef, LPF_ORDER, LPF_FC, Fs, 1);

  DECIMAL_TYPE normFactor = 0;
  unsigned long i = 0;
  int totalFrames = 0;
  while (!feof(in)) {
    unsigned long n = GetComplexWaveChunk(in, header, wave, wtime, chunkSize);
    if (n == 0) break;
    if (i == 0 && normFactor == 0)
      normFactor = StaticGain(wave, n, 1);  /* realtime app: desired level 1 */
    i += n;
    CarrierTrackPLL(wave, real, lock, n, Fs, MAX_DEV, PLL_THRESH,
                    PLL_LOCKA * (2.0 * M_PI / Fs),
                    PLL_ACQ * (2.0 * M_PI / Fs),
                    PLL_TRK * (2.0 * M_PI / Fs));
    LowPassFilter(real, n, coef, LPF_ORDER);
    NormalizingAGC(real, n, normFactor, AGC_ATK * (2.0 * M_PI / Fs),
                   AGC_DCY * (2.0 * M_PI / Fs));
    Squelch(real, lock, n, SQLCH);
    unsigned long nSym = GardenerClockRecovery(real, wtime, n, sym, Fs, BAUD,
                                               GDNR_LIM, GDNR_GAIN);
    unsigned long nBits = ManchesterDecode(sym, wtime, nSym, bits, RESYNC);
    totalFrames += FindSyncWords(bits, wtime, nBits, "0001011110000", 13, out);
  }
  fclose(out);
  fprintf(stderr, "tap_argosp: %d packets\n", totalFrames);
  return 0;
}
