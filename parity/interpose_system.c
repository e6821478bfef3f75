/* LD_PRELOAD interposer for the parity harness.
 *
 * The C++ reference executes its cut by shelling out to
 * /usr/local/bin/ffmpeg with a concat list exposed through a memfd
 * (pipeline.cpp:476-533).  This environment has no ffmpeg binary, and the
 * parity harness wants the *exact* concat list (inpoint/outpoint per
 * segment) the reference produced.  Interposing system() lets us read the
 * memfd path from the command line from inside the same process (the fd
 * is still open), dump the list to $MVT_CONCAT_DUMP, and report success.
 *
 * Build: gcc -shared -fPIC -O2 interpose_system.c -o libinterpose_system.so
 * Use:   LD_PRELOAD=.../libinterpose_system.so MVT_CONCAT_DUMP=/tmp/x ./motion_trim ...
 */
#define _GNU_SOURCE
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int system(const char *command) {
  const char *dump = getenv("MVT_CONCAT_DUMP");
  const char *log = getenv("MVT_SYS_LOG");
  if (log) {
    FILE *f = fopen(log, "a");
    if (f) {
      fprintf(f, "%s\n", command ? command : "(null)");
      fclose(f);
    }
  }
  if (command && dump) {
    /* extract the -i "<path>" argument */
    const char *p = strstr(command, "-i \"");
    if (p) {
      p += 4;
      const char *q = strchr(p, '"');
      if (q && q - p < 4000) {
        char path[4096];
        memcpy(path, p, (size_t)(q - p));
        path[q - p] = '\0';
        FILE *in = fopen(path, "r");
        if (in) {
          FILE *out = fopen(dump, "w");
          if (out) {
            char buf[8192];
            size_t n;
            while ((n = fread(buf, 1, sizeof buf, in)) > 0)
              fwrite(buf, 1, n, out);
            fclose(out);
          }
          fclose(in);
        }
      }
    }
  }
  return 0; /* pretend the cut succeeded */
}
