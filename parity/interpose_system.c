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

/* copy the concat list at `list_path` to `dst` */
static void copy_list(const char *list_path, const char *dst) {
  FILE *in = fopen(list_path, "r");
  if (!in) return;
  FILE *out = fopen(dst, "w");
  if (out) {
    char buf[8192];
    size_t n;
    while ((n = fread(buf, 1, sizeof buf, in)) > 0) fwrite(buf, 1, n, out);
    fclose(out);
  }
  fclose(in);
}

/* last character of `s` before a trailing quote, scanning backwards */
static const char *basename_of(const char *path_start, const char *path_end,
                               size_t *len) {
  const char *b = path_end;
  while (b > path_start && b[-1] != '/') b--;
  *len = (size_t)(path_end - b);
  return b;
}

int system(const char *command) {
  const char *dump = getenv("MVT_CONCAT_DUMP");
  const char *dump_dir = getenv("MVT_CONCAT_DUMP_DIR");
  const char *log = getenv("MVT_SYS_LOG");
  if (log) {
    FILE *f = fopen(log, "a");
    if (f) {
      fprintf(f, "%s\n", command ? command : "(null)");
      fclose(f);
    }
  }
  if (command && (dump || dump_dir)) {
    /* extract the -i "<path>" argument */
    const char *p = strstr(command, "-i \"");
    if (p) {
      p += 4;
      const char *q = strchr(p, '"');
      if (q && q - p < 4000) {
        char path[4096];
        memcpy(path, p, (size_t)(q - p));
        path[q - p] = '\0';
        if (dump) copy_list(path, dump);
        if (dump_dir) {
          /* batch mode: key the dump by the output file's basename —
             the output path is the last quoted argument */
          const char *last_q = strrchr(command, '"');
          if (last_q && last_q > q + 1) {
            const char *out_start = last_q;
            while (out_start > command && out_start[-1] != '"') out_start--;
            size_t blen;
            const char *base = basename_of(out_start, last_q, &blen);
            char dst[4096];
            snprintf(dst, sizeof dst, "%s/%.*s.concat", dump_dir,
                     (int)blen, base);
            copy_list(path, dst);
          }
        }
      }
    }
  }
  return 0; /* pretend the cut succeeded */
}
