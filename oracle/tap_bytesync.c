/* tap_bytesync.c — framer-only oracle harness: reads an ASCII bit string on
 * stdin, runs the reference POES ByteSyncOnSyncword over it in chunks of
 * argv[1] bits (default all at once), frames to stdout.  Used to validate
 * the framework's StreamFramer against the reference framer on arbitrary
 * bit streams, including the fixture embedded in POESTIPdemod/ByteSync.c. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int ByteSyncOnSyncword(unsigned char *bitStreamIn, DECIMAL_TYPE *bitStreamInTime,
                       unsigned long nSamples, char *syncWord,
                       unsigned int syncWordLength, FILE *minorFrameFile);

int main(int argc, char **argv) {
  unsigned long chunk = argc > 1 ? strtoul(argv[1], 0, 10) : 0;
  static unsigned char bits[1 << 22];
  unsigned long n = 0;
  int ch;
  while ((ch = getchar()) != EOF) {
    if (ch == '0' || ch == '1') bits[n++] = (unsigned char)ch;
  }
  DECIMAL_TYPE *times = malloc(sizeof(DECIMAL_TYPE) * (n + 1));
  for (unsigned long i = 0; i < n; i++) times[i] = (DECIMAL_TYPE)i;
  if (!chunk) chunk = n;
  int frames = 0;
  for (unsigned long lo = 0; lo < n; lo += chunk) {
    unsigned long len = lo + chunk < n ? chunk : n - lo;
    frames += ByteSyncOnSyncword(bits + lo, times + lo, len,
                                 "1110110111100010000", 19, stdout);
  }
  fprintf(stderr, "%d\n", frames);
  return 0;
}
