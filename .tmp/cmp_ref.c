#include <stdio.h>
#include <kalign/kalign.h>
int main(int argc, char** argv){
    struct msa *r = NULL, *t = NULL; float score=0;
    kalign_read_input(argv[1], &r, 1);
    kalign_read_input(argv[2], &t, 1);
    kalign_msa_compare(r, t, &score);
    printf("SP %.10f\n", score);
    struct kalign_poar_score ps;
    kalign_read_input(argv[1], &r, 1); // re-read (sorting mutated)? keep simple: reuse
    kalign_msa_compare_detailed(r, t, 0.2f, &ps);
    printf("detail %.10f %.10f %.10f %.10f\n", ps.recall, ps.precision, ps.f1, ps.tc);
    return 0;
}
