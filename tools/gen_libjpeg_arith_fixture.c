/* Generator for the independent arithmetic-JPEG (SOF9) fixture used by
 * tests/test_codec_external.py — ADVICE r9: the in-repo QM coder was
 * previously validated only against its own encoder twin, so a shared
 * byte-feed/marker-termination/INITDEC convention error could mis-decode
 * real libjpeg-produced files while passing every test.
 *
 * Build & run (container ships gcc + libjpeg62-turbo-dev):
 *   gcc -O2 tools/gen_libjpeg_arith_fixture.c -ljpeg -o /tmp/genarith
 *   /tmp/genarith <quality> <mode> > out.bin
 * where mode 0 = RGB gradient (libjpeg default 4:2:0 subsampling),
 * 1 = uniform gray, 2 = RGB gradient at 4:4:4.  Output stream:
 *   [u32 jpeg_len][jpeg bytes][u32 raw_len][libjpeg-decoded RGB bytes]
 * i.e. BOTH the externally encoded bytes and the external decoder's own
 * pixel output, so the test compares this repo's decoder against
 * libjpeg's decode of libjpeg's encode — zero shared code with the
 * package (arrow_ballista_spark/operators/jpeg.py).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

#define W 32
#define H 24

static void write_u32(unsigned long v) {
    unsigned char b[4] = {v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
                          (v >> 24) & 0xff};
    fwrite(b, 1, 4, stdout);
}

int main(int argc, char **argv) {
    int quality = argc > 1 ? atoi(argv[1]) : 90;
    int mode = argc > 2 ? atoi(argv[2]) : 0;
    int uniform = mode == 1;
    unsigned char img[H * W * 3];
    for (int y = 0; y < H; y++)
        for (int x = 0; x < W; x++) {
            unsigned char *p = img + (y * W + x) * 3;
            if (uniform) {
                p[0] = p[1] = p[2] = 128;
            } else {
                p[0] = (unsigned char)(x * 8);        /* R: horiz ramp */
                p[1] = (unsigned char)(y * 10);       /* G: vert ramp  */
                p[2] = (unsigned char)((x + y) * 4);  /* B: diagonal   */
            }
        }

    /* ---- encode: arithmetic-coded sequential (SOF9 + DAC) ---- */
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr jerr;
    unsigned char *buf = NULL;
    unsigned long buflen = 0;
    c.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&c);
    jpeg_mem_dest(&c, &buf, &buflen);
    c.image_width = W;
    c.image_height = H;
    c.input_components = 3;
    c.in_color_space = JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, quality, TRUE);
    c.arith_code = TRUE; /* sequential DCT + arithmetic entropy = SOF9 */
    if (mode == 2) { /* 4:4:4 — isolates the entropy coder + IDCT */
        c.comp_info[0].h_samp_factor = 1;
        c.comp_info[0].v_samp_factor = 1;
    }
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < H) {
        JSAMPROW row = img + c.next_scanline * W * 3;
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);

    /* ---- decode the SAME bytes back with libjpeg ---- */
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr derr;
    d.err = jpeg_std_error(&derr);
    jpeg_create_decompress(&d);
    jpeg_mem_src(&d, buf, buflen);
    jpeg_read_header(&d, TRUE);
    jpeg_start_decompress(&d);
    unsigned char out[H * W * 3];
    while (d.output_scanline < d.output_height) {
        JSAMPROW row = out + d.output_scanline * d.output_width *
                                 d.output_components;
        jpeg_read_scanlines(&d, &row, 1);
    }
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);

    write_u32(buflen);
    fwrite(buf, 1, buflen, stdout);
    write_u32(sizeof(out));
    fwrite(out, 1, sizeof(out), stdout);
    free(buf);
    return 0;
}
