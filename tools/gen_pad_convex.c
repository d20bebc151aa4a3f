#include <stdio.h>
#include <stdlib.h>
#include "tinyhtm/geometry.h"

/* read n xyz triples (hex floats); mode C=convex, P=pad by r */
int main(int argc, char **argv) {
    char mode = argv[1][0];
    int n = atoi(argv[2]);
    double r = argc > 3 ? strtod(argv[3], 0) : 0.0;
    struct htm_v3 v[64];
    for (int i = 0; i < n; i++) {
        if (scanf("%la %la %la", &v[i].x, &v[i].y, &v[i].z) != 3) return 2;
    }
    enum htm_errcode ec = HTM_OK;
    if (mode == 'C') {
        int res = htm_v3_convex(v, (size_t)n, &ec);
        printf("%d %d\n", res, (int)ec);
        return 0;
    }
    struct htm_s2cpoly *p = htm_s2cpoly_init(v, (size_t)n, &ec);
    if (!p) { printf("ERRINIT %d\n", (int)ec); return 0; }
    ec = htm_s2cpoly_pad(p, r);
    printf("%d\n", (int)ec);
    if (ec == HTM_OK) {
        for (size_t i = 0; i < 2 * p->n; i++)
            printf("%a %a %a\n", p->ve[i].x, p->ve[i].y, p->ve[i].z);
        printf("%a %a %a\n", p->vsum.x, p->vsum.y, p->vsum.z);
    }
    free(p);
    return 0;
}
