#!/bin/bash
# Build the reference C demodulators (sources read-only from /root/reference)
# into /root/repo/oracle/build. Used ONLY as a test oracle / baseline timer.
set -e
REF=/root/reference
OUT=/root/repo/oracle/build
SHIM=/root/repo/oracle/shims
mkdir -p "$OUT"
COMMON="$REF/common/wave.c $REF/common/AGC.c $REF/common/CarrierTrackingPLL.c $REF/common/LowPassFilter.c $REF/common/GardenerClockRecovery.c $REF/common/MMClockRecovery.c $REF/common/ManchesterDecode.c"
gcc -O2 -I"$SHIM" -I"$REF/common" -I"$REF/POESTIPdemod" -include "$REF/POESTIPdemod/config.h" \
    "$REF/POESTIPdemod/main.c" "$REF/POESTIPdemod/ByteSync.c" $COMMON \
    -lm -o "$OUT/demodPOES"
gcc -O2 -I"$SHIM" -I"$REF/common" -I"$REF/ARGOSdemod" -include "$REF/ARGOSdemod/config.h" \
    "$REF/ARGOSdemod/main.c" "$REF/ARGOSdemod/ByteSync.c" $COMMON \
    -lm -o "$OUT/demodARGOS"
echo "built: $OUT/demodPOES $OUT/demodARGOS"

# stage-tap driver (our own harness linking reference DSP objects)
gcc -O2 -I"$SHIM" -I"$REF/common" -include "$REF/POESTIPdemod/config.h" \
    /root/repo/oracle/tap_poes.c "$REF/POESTIPdemod/ByteSync.c" $COMMON \
    -lm -o "$OUT/tap_poes"
echo "built: $OUT/tap_poes"

# framer-only harness
gcc -O2 -I"$SHIM" -I"$REF/common" -include "$REF/POESTIPdemod/config.h" \
    /root/repo/oracle/tap_bytesync.c "$REF/POESTIPdemod/ByteSync.c" \
    -lm -o "$OUT/tap_bytesync"
echo "built: $OUT/tap_bytesync"

# ARGOS realtime-variant harness (float32 config, inverse-sync framer)
gcc -O2 -I"$SHIM" -I"$REF/common" -include "$REF/ARGOSdemodPortAudio/config.h" \
    /root/repo/oracle/tap_argosp.c "$REF/ARGOSdemodPortAudio/ByteSync.c" $COMMON \
    -lm -o "$OUT/tap_argosp"
echo "built: $OUT/tap_argosp"
