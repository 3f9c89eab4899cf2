/* Test-side independent JPEG encode/decode helper driving the system
 * libjpeg-turbo. enc: PGM/PPM -> JPEG (optional arithmetic coding,
 * optional progressive); dec: JPEG -> PGM/PPM. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(2); }

static unsigned char *read_pnm(const char *path, int *w, int *h, int *ch) {
    FILE *f = fopen(path, "rb");
    if (!f) die("open in");
    char magic[3] = {0};
    int maxv;
    if (fscanf(f, "%2s", magic) != 1) die("pnm magic");
    *ch = strcmp(magic, "P6") == 0 ? 3 : strcmp(magic, "P5") == 0 ? 1 : 0;
    if (!*ch) die("pnm type");
    if (fscanf(f, "%d %d %d", w, h, &maxv) != 3 || maxv != 255) die("pnm hdr");
    fgetc(f);
    size_t n = (size_t)*w * *h * *ch;
    unsigned char *buf = malloc(n);
    if (fread(buf, 1, n, f) != n) die("pnm body");
    fclose(f);
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 4) die("usage: enc|dec in out [quality] [arith] [prog]");
    if (strcmp(argv[1], "enc") == 0) {
        int w, h, ch;
        unsigned char *px = read_pnm(argv[2], &w, &h, &ch);
        struct jpeg_compress_struct c;
        struct jpeg_error_mgr err;
        c.err = jpeg_std_error(&err);
        jpeg_create_compress(&c);
        FILE *out = fopen(argv[3], "wb");
        if (!out) die("open out");
        jpeg_stdio_dest(&c, out);
        c.image_width = w; c.image_height = h;
        c.input_components = ch;
        c.in_color_space = ch == 3 ? JCS_RGB : JCS_GRAYSCALE;
        jpeg_set_defaults(&c);
        jpeg_set_quality(&c, argc > 4 ? atoi(argv[4]) : 90, TRUE);
        if (argc > 5 && atoi(argv[5])) c.arith_code = TRUE;
        if (argc > 6 && atoi(argv[6])) jpeg_simple_progression(&c);
        if (argc > 7) c.restart_interval = atoi(argv[7]);
        if (argc > 8) {  /* DC conditioning "L,U" */
            int l, u;
            if (sscanf(argv[8], "%d,%d", &l, &u) == 2)
                for (int t = 0; t < NUM_ARITH_TBLS; t++) {
                    c.arith_dc_L[t] = l; c.arith_dc_U[t] = u;
                }
        }
        if (argc > 9)
            for (int t = 0; t < NUM_ARITH_TBLS; t++)
                c.arith_ac_K[t] = atoi(argv[9]);
        jpeg_start_compress(&c, TRUE);
        while (c.next_scanline < c.image_height) {
            JSAMPROW row = px + (size_t)c.next_scanline * w * ch;
            jpeg_write_scanlines(&c, &row, 1);
        }
        jpeg_finish_compress(&c);
        fclose(out);
        jpeg_destroy_compress(&c);
    } else {
        struct jpeg_decompress_struct d;
        struct jpeg_error_mgr err;
        d.err = jpeg_std_error(&err);
        jpeg_create_decompress(&d);
        FILE *in = fopen(argv[2], "rb");
        if (!in) die("open in");
        jpeg_stdio_src(&d, in);
        jpeg_read_header(&d, TRUE);
        jpeg_start_decompress(&d);
        int w = d.output_width, h = d.output_height, ch = d.output_components;
        FILE *out = fopen(argv[3], "wb");
        fprintf(out, "%s\n%d %d\n255\n", ch == 3 ? "P6" : "P5", w, h);
        unsigned char *row = malloc((size_t)w * ch);
        while (d.output_scanline < h) {
            JSAMPROW r = row;
            jpeg_read_scanlines(&d, &r, 1);
            fwrite(row, 1, (size_t)w * ch, out);
        }
        fclose(out); fclose(in);
        jpeg_finish_decompress(&d);
        jpeg_destroy_decompress(&d);
    }
    return 0;
}
