/* Linux shim for the reference build: conio.h is only used for kbhit()
   in the realtime apps; the file-mode apps include it but never call it. */
#ifndef CONIO_SHIM_H
#define CONIO_SHIM_H
static inline int kbhit(void) { return 0; }
#endif
