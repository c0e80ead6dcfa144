/* Decode a JPEG from stdin with libjpeg and write raw pixels to stdout:
 *   [u32 w][u32 h][u32 comps][w*h*comps bytes]   (little-endian u32s)
 *
 * Used by tests/test_codec_external.py to check that the PACKAGE
 * ENCODERS (operators/jpeg.py: baseline, progressive, 4:2:0,
 * arithmetic SOF9) emit streams an independent implementation accepts
 * and decodes to the same pixels — the reverse direction of the
 * gen_libjpeg_arith_fixture.c check (independent encode -> package
 * decode).  Build:
 *   gcc -O2 tools/libjpeg_decode_helper.c -ljpeg -o <out>
 */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
#include <setjmp.h>

struct err_jmp { struct jpeg_error_mgr mgr; jmp_buf env; };

static void on_error(j_common_ptr cinfo) {
    struct err_jmp *e = (struct err_jmp *)cinfo->err;
    longjmp(e->env, 1);
}

static void write_u32(unsigned long v) {
    unsigned char b[4] = {v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
                          (v >> 24) & 0xff};
    fwrite(b, 1, 4, stdout);
}

int main(void) {
    /* slurp stdin */
    size_t cap = 1 << 20, len = 0;
    unsigned char *buf = malloc(cap);
    size_t n;
    while ((n = fread(buf + len, 1, cap - len, stdin)) > 0) {
        len += n;
        if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
    }

    struct jpeg_decompress_struct d;
    struct err_jmp err;
    d.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = on_error;
    if (setjmp(err.env)) { fprintf(stderr, "decode failed\n"); return 2; }
    jpeg_create_decompress(&d);
    jpeg_mem_src(&d, buf, len);
    jpeg_read_header(&d, TRUE);
    jpeg_start_decompress(&d);
    unsigned long w = d.output_width, h = d.output_height,
                  c = d.output_components;
    write_u32(w); write_u32(h); write_u32(c);
    unsigned char *row = malloc(w * c);
    while (d.output_scanline < h) {
        JSAMPROW r = row;
        jpeg_read_scanlines(&d, &r, 1);
        fwrite(row, 1, w * c, stdout);
    }
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    free(row);
    free(buf);
    return 0;
}
